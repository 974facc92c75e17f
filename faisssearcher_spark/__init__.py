"""faisssearcher_spark — a PySpark-native vector-search analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``mechsihao/FaissSearcher`` (a single-process pandas + FAISS
wrapper), re-expressed as idiomatic Spark:

- the metric library (``backend/faiss_searcher.py:75-90`` in the reference)
  becomes Catalyst-native column expressions (``zip_with``/``aggregate``)
  that compile into whole-stage codegen — no Python on the scoring path;
- the flagship batched top-K nearest-neighbor search
  (``faiss_searcher.py:161-187``) becomes an exact k-NN similarity join:
  broadcast the small side, score with codegen'd expressions, rank with a
  window (Spark's WindowGroupLimit pushes the K-limit below the shuffle);
- PCA whitening (``vecs_whitening.py``) becomes a distributed
  moment-aggregation fit + driver-side SVD + broadcast affine transform;
- the pluggable encoder (``base_encoder.py``) becomes an Arrow-vectorized
  ``pandas_udf`` factory;
- persistence (pickle in the reference) becomes Parquet + JSON metadata.

Beyond reference parity the package ships the LLM-data-pipeline operators a
100 TB corpus needs: exact & near deduplication (MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), text analysis (language id, quality
scoring, token statistics, fingerprinting), approximate nearest-neighbor
search (LSH bucketing), multimodal column plumbing, and event-stream
rollups (batch + Structured Streaming).
"""

from faisssearcher_spark.searcher import SparkSearcher
from faisssearcher_spark.operators.knn import knn_join, cal_sim
from faisssearcher_spark.operators import (ann, balance, bitext, bm25,
                                           bpe, classifier,
                                           curate,
                                           decontam, dedup, evaluation, events,
                                           incremental,
                                           layout, maxsim, multimodal,
                                           privacy, rerank,
                                           sampling, temporal,
                                           text_analysis, unigram,
                                           wordpiece)
from faisssearcher_spark.functions import metrics

__all__ = ["SparkSearcher", "knn_join", "cal_sim", "metrics",
           "ann", "balance", "bitext", "bm25", "bpe", "classifier",
           "curate", "decontam", "dedup", "evaluation", "events", "incremental",
           "layout", "maxsim", "multimodal", "privacy", "rerank",
           "sampling", "temporal", "text_analysis", "unigram",
           "wordpiece"]

__version__ = "0.1.0"
