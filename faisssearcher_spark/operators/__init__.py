from faisssearcher_spark.operators.knn import knn_join, cal_sim
from faisssearcher_spark.operators import (balance, bloom, bm25, bpe,
                                           classifier, conversations,
                                           curate,
                                           decontam, dedup, diffing, expect, graph,
                                           incremental, layout,
                                           privacy, projection,
                                           sampling, sketches,
                                           temporal,
                                           text_analysis)

__all__ = ["knn_join", "cal_sim", "balance", "bloom", "bm25", "bpe", "classifier", "conversations", "curate",
           "decontam", "dedup", "diffing", "expect", "graph", "incremental", "layout", "privacy", "projection", "sampling", "sketches", "temporal",
           "text_analysis"]
