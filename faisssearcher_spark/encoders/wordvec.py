"""Pretrained word-vector encoder: weight load as a TABLE, encode as a JOIN.

Reference parity: S7 "encoder weight load" — the reference restores
encoder weights from a checkpoint into process memory
(bert_encoder.py:239, :263-283 — keras ``load_weights`` over a BERT
graph). The transformer forward pass itself stays out of engine scope
(SURVEY.md §2.8: encoders are pluggable), but the *weight-loading
semantic* has an idiomatic Spark answer that scales past any single
process: pretrained token embeddings land in a parquet table
``(token string, vector array<float>)``, and encoding a corpus is a
relational plan —

    tokenize → explode → equi-join tokens to weights → per-doc fold

— so a 10M-row vocabulary never materializes on the driver, the join
broadcasts or shuffles by Catalyst/AQE's own size estimates, and weight
updates are a parquet overwrite, not a process restart.

Two surfaces:

- :meth:`WordVecEncoder.encode_df` — the scalable path: pure DataFrame
  in, DataFrame out, no Python on the data path, no driver state.
- :meth:`WordVecEncoder.encode` — the :class:`~faisssearcher_spark.
  encoders.base.Encoder` protocol (reference contract
  base_encoder.py:9-10) for the ``SparkSearcher`` facade and small
  driver-side batches; it lazily collects the vocabulary ONCE into a
  dict (bounded by ``max_driver_vocab``, default 2M entries) and is
  pickled to executors by ``encoder_udf`` like any other encoder.

Out-of-vocabulary policy: OOV tokens contribute nothing; a document with
no in-vocabulary token encodes to the zero vector (searchers score it 0
under cosine — the documented zero-norm rule, operators/knn.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_WS = re.compile(r"\s+")


class WordVecEncoder:
    """Mean (or sum) of pretrained per-token vectors.

    Build one with :meth:`load` (weights parquet) or
    :meth:`from_dataframe`; persist with :meth:`save`.

    ``mode="mean"`` divides by the number of IN-VOCABULARY tokens (the
    fastText/GloVe sentence-embedding convention); ``mode="sum"`` skips
    the division (matches :class:`HashingEncoder`'s additive shape).
    """

    def __init__(self, weights: DataFrame, *, token_col: str = "token",
                 vec_col: str = "vector", mode: str = "mean",
                 max_driver_vocab: int = 2_000_000):
        if mode not in ("mean", "sum"):
            raise ValueError("mode must be 'mean' or 'sum'")
        first = weights.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None or first["d"] is None:
            raise ValueError("weights table is empty — cannot discover dim "
                             "(reference dim-probe parity, "
                             "faiss_searcher.py:56)")
        self.dim = int(first["d"])
        # deterministic duplicate policy: smallest vector struct wins,
        # mirroring the payload dedup rule in operators/knn.py
        self._weights = (
            weights.select(F.col(token_col).alias("__tok"),
                           F.col(vec_col).cast("array<double>").alias("__wv"))
            .groupBy("__tok").agg(F.min(F.struct("__wv")).alias("__s"))
            .select("__tok", F.col("__s.__wv").alias("__wv")))
        self.mode = mode
        self.max_driver_vocab = max_driver_vocab
        self._vocab: dict[str, np.ndarray] | None = None

    # -- construction / persistence (S7: weights live in storage) ----------

    @classmethod
    def load(cls, spark: SparkSession, path: str, **kwargs) -> "WordVecEncoder":
        """Load a weights parquet written by :meth:`save` (or any table
        with (token, vector) columns) — the checkpoint-restore parity
        point, minus the pickle the reference relies on."""
        return cls(spark.read.parquet(path), **kwargs)

    @classmethod
    def from_dataframe(cls, weights: DataFrame, **kwargs) -> "WordVecEncoder":
        return cls(weights, **kwargs)

    def save(self, path: str) -> None:
        (self._weights.select(F.col("__tok").alias("token"),
                              F.col("__wv").cast("array<float>")
                              .alias("vector"))
         .write.mode("overwrite").parquet(path))

    # -- the scalable path: encode as a relational plan --------------------

    def encode_df(self, df: DataFrame, *, text_col: str = "text",
                  out_col: str = "embedding") -> DataFrame:
        """Append ``out_col`` (array<float>, length ``dim``) to ``df``.

        Plan shape: explode_outer the token list (empty docs survive as
        one null-token row), equi-join to the weight table (Catalyst/AQE
        pick broadcast vs shuffle from the vocabulary's real size), one
        groupBy fold per document. The explode_outer + attribute-filter
        shape keeps the tokenizer out of inferred filters (the r3
        Catalyst trap, NOTES.md). The fold buffers one document's matched
        vectors (collect_list) per aggregation group — bounded by
        tokens·dim doubles for the LONGEST document, so chunk pathological
        documents first (operators/text_analysis.chunk_documents) rather
        than feeding multi-million-token rows through any encoder."""
        doc_cols = df.columns
        # Group on a generated row key, NOT on the document columns:
        # grouping by every input column silently collapses fully-duplicate
        # rows (a corpus without an id column) and fails outright on
        # non-orderable column types (map). The key is per-row unique, the
        # payload columns ride through first() aggregates (constant within
        # each group), and the shuffle volume is unchanged.
        rid = "__wv_rid"
        while rid in doc_cols:
            rid += "_"
        toks = df.withColumn(rid, F.monotonically_increasing_id()).withColumn(
            "__tok",
            F.explode_outer(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                                     lambda t: t != "")))
        joined = toks.join(self._weights, "__tok", "left")
        zero = F.array_repeat(F.lit(0.0), self.dim)
        summed = (
            joined.groupBy(rid)
            .agg(*[F.first(c).alias(c) for c in doc_cols],
                 F.count("__wv").alias("__n"),
                 F.aggregate(
                     F.collect_list("__wv"), zero,
                     lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b))
                 .alias("__sum")))
        vec = F.col("__sum")
        if self.mode == "mean":
            vec = F.when(F.col("__n") > 0,
                         F.transform(vec, lambda x: x / F.col("__n"))) \
                .otherwise(zero)
        return summed.select(*doc_cols,
                             vec.cast("array<float>").alias(out_col))

    # -- Encoder protocol (driver/UDF path, bounded vocab) -----------------

    def _vocab_dict(self) -> dict[str, np.ndarray]:
        if self._vocab is None:
            n = self._weights.count()
            if n > self.max_driver_vocab:
                raise ValueError(
                    f"vocabulary has {n} entries > max_driver_vocab="
                    f"{self.max_driver_vocab}; use encode_df (the join "
                    f"path) or raise the bound explicitly")
            self._vocab = {
                r["__tok"]: np.asarray(r["__wv"], dtype=np.float64)
                for r in self._weights.collect()}
        return self._vocab

    def encode(self, items, verbose: int = 0) -> np.ndarray:
        vocab = self._vocab_dict()
        texts = list(items)
        out = np.zeros((len(texts), self.dim), dtype=np.float64)
        for i, text in enumerate(texts):
            hits = 0
            for tok in _WS.split(str(text).strip()):
                vec = vocab.get(tok) if tok else None
                if vec is not None:
                    out[i] += vec
                    hits += 1
            if self.mode == "mean" and hits:
                out[i] /= hits
        return out.astype(np.float32)

    def __reduce__(self):
        # encoder_udf pickles encoders to executors: ship the collected
        # vocab (bounded), never the DataFrame/session handle
        vocab = self._vocab_dict()
        return (_rebuild_wordvec, (vocab, self.dim, self.mode))


def _rebuild_wordvec(vocab: dict, dim: int, mode: str) -> "WordVecEncoder":
    enc = WordVecEncoder.__new__(WordVecEncoder)
    enc.dim = dim
    enc.mode = mode
    enc.max_driver_vocab = len(vocab)
    enc._vocab = vocab
    enc._weights = None  # executor copies never touch the DataFrame path
    return enc
