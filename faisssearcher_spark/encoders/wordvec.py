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
    the division (matches :class:`HashingEncoder`'s additive shape);
    ``mode="sif"`` is the smooth-inverse-frequency weighted average
    (Arora et al. 2017, "A Simple but Tough-to-Beat Baseline"): each
    token vector scales by ``a / (a + p(token))`` with ``p`` the corpus
    unigram probability (``sif_probs`` table, fit with
    :meth:`fit_sif_probs`), damping stopword dominance. The scaling is
    folded INTO the weight table at construction, so both encode paths
    (relational join and driver dict) run the identical mean machinery;
    tokens absent from the probs table get weight ≈ 1 (p → 0). Complete
    the SIF recipe by removing the corpus' first principal component
    from the encoded output (:func:`fit_first_component` +
    :func:`remove_component`).
    """

    def __init__(self, weights: DataFrame, *, token_col: str = "token",
                 vec_col: str = "vector", mode: str = "mean",
                 max_driver_vocab: int = 2_000_000,
                 sif_probs: DataFrame | None = None, sif_a: float = 1e-3,
                 prob_token_col: str = "token", prob_col: str = "p"):
        if mode not in ("mean", "sum", "sif"):
            raise ValueError("mode must be 'mean', 'sum', or 'sif'")
        if mode == "sif" and sif_probs is None:
            raise ValueError("mode='sif' needs a sif_probs table "
                             "(fit one with WordVecEncoder.fit_sif_probs)")
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
        # save() must persist the PRE-SIF weights: saving the folded
        # vectors and reloading with mode='sif' would apply a/(a+p) twice
        self._raw_weights = self._weights
        if mode == "sif":
            # fold a/(a+p) into the vectors once; duplicate prob rows
            # dedup by min so the join can never fan out
            probs = (sif_probs
                     .select(F.col(prob_token_col).alias("__tok"),
                             F.col(prob_col).cast("double").alias("__p"))
                     .groupBy("__tok").agg(F.min("__p").alias("__p")))
            w = F.lit(float(sif_a)) \
                / (F.lit(float(sif_a)) + F.coalesce(F.col("__p"), F.lit(0.0)))
            self._weights = (
                self._weights.join(probs, "__tok", "left")
                .withColumn("__sifw", w)
                .select("__tok",
                        F.transform("__wv",
                                    lambda x: x * F.col("__sifw"))
                        .alias("__wv")))
        self.mode = mode
        self.max_driver_vocab = max_driver_vocab
        self._vocab: dict[str, np.ndarray] | None = None

    # -- construction / persistence (S7: weights live in storage) ----------

    @staticmethod
    def fit_sif_probs(corpus: DataFrame, *, text_col: str = "text") -> DataFrame:
        """Corpus unigram probabilities ``(token, p)`` for ``mode="sif"``:
        one explode + hash aggregate; the total token count is a single
        driver scalar (the dsir normalizer pattern), so ``p`` divides
        exactly once per distinct token."""
        toks = (corpus.select(
            F.explode_outer(F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                                     lambda t: t != "")).alias("token"))
            .filter(F.col("token").isNotNull()))
        counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
        total_row = counts.agg(F.sum("cnt").alias("t")).first()
        total = int(total_row["t"] or 0)
        if total == 0:
            raise ValueError("cannot fit SIF probabilities on an empty corpus")
        return counts.select("token",
                             (F.col("cnt") / F.lit(float(total))).alias("p"))

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
        """Write the RAW (pre-SIF) deduplicated weights — a table that
        reconstructs this encoder through ``load(..., mode=self.mode,
        sif_probs=...)`` without double-applying the SIF fold."""
        (self._raw_weights.select(F.col("__tok").alias("token"),
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
        if self.mode in ("mean", "sif"):
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
            if self.mode in ("mean", "sif") and hits:
                out[i] /= hits
        return out.astype(np.float32)

    def __reduce__(self):
        # encoder_udf pickles encoders to executors: ship the collected
        # vocab (bounded), never the DataFrame/session handle
        vocab = self._vocab_dict()
        return (_rebuild_wordvec, (vocab, self.dim, self.mode))


def fit_first_component(df: DataFrame, *, vec_col: str = "embedding"
                        ) -> np.ndarray:
    """Top principal direction of the UNCENTERED embedding matrix — the
    common-discourse component the SIF recipe removes (Arora et al. 2017
    compute the first singular vector of the stacked sentence
    embeddings, no centering).

    One distributed moment pass (reuses
    :func:`~faisssearcher_spark.operators.whitening.vector_moments` —
    only O(partitions · d²) floats reach the driver), then a d×d eigh.
    Sign is canonicalized (first non-zero entry positive) so the
    component is deterministic across runs."""
    from faisssearcher_spark.operators.whitening import vector_moments

    n, mu, cov = vector_moments(df, vec_col)
    gram = cov * (n - 1) + n * np.outer(mu, mu)   # reconstruct XᵀX
    _, vecs = np.linalg.eigh(gram)
    u = vecs[:, -1]
    nz = np.flatnonzero(np.abs(u) > 1e-12)
    if len(nz) and u[nz[0]] < 0:
        u = -u
    return u


def remove_component(df: DataFrame, component: "np.ndarray | list[float]",
                     *, vec_col: str = "embedding",
                     out_col: str | None = None) -> DataFrame:
    """Project the component out of every vector: ``v − (v·u)u``.

    Pure Catalyst — the unit direction ships as an inline literal array
    (the dsir/LSH plane-constant pattern), the dot product materializes
    as its own column BEFORE the subtraction ``zip_with`` (expressions
    referenced inside higher-order lambdas re-evaluate per element —
    NOTES.md trap — so inlining the dot would cost O(d²) per row)."""
    u = np.asarray(component, dtype=np.float64)
    norm = float(np.linalg.norm(u))
    if norm == 0:
        raise ValueError("component must be non-zero")
    u = u / norm
    out_col = out_col or vec_col
    u_lit = F.array(*[F.lit(float(x)) for x in u])
    v = F.col(vec_col).cast("array<double>")
    dot_tmp = "__pc_dot"
    while dot_tmp in df.columns:
        dot_tmp += "_"
    dotted = df.withColumn(
        dot_tmp,
        F.aggregate(F.zip_with(v, u_lit, lambda a, b: a * b),
                    F.lit(0.0), lambda acc, x: acc + x))
    return (dotted.withColumn(
        out_col,
        F.zip_with(v, u_lit,
                   lambda a, b: a - F.col(dot_tmp) * b)
        .cast("array<float>"))
        .drop(dot_tmp))


def _rebuild_wordvec(vocab: dict, dim: int, mode: str) -> "WordVecEncoder":
    enc = WordVecEncoder.__new__(WordVecEncoder)
    enc.dim = dim
    enc.mode = mode
    enc.max_driver_vocab = len(vocab)
    enc._vocab = vocab
    # executor copies never touch the DataFrame path
    enc._weights = None
    enc._raw_weights = None
    return enc
