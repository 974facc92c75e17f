"""Pairwise rerank stage — reference U6 parity.

The reference's interact mode scores (text1, text2) PAIRS with a cross
encoder (``BertEncoder.predict`` over ``InteractDataGenerator``,
backend/bert_encoder.py:187-192, encoder_utils.py:78-105) — the classic
retrieve-then-rerank second stage. Here the stage is engine surface:

    candidates (from knn_join / ANN)  →  pairwise scorer  →  new per-query
    ranking (row_number window)  →  optional top-k cut

The scorer is any ``(pd.Series, pd.Series) -> pd.Series`` callable wrapped
into an Arrow ``pandas_udf`` — the pair analog of the Encoder protocol, so
a real cross-encoder plugs in the same way a BERT encoder plugs into
encoding. ``token_jaccard_scorer`` is the deterministic default (token-set
Jaccard) with an exact DuckDB twin, so the full retrieve→rerank pipeline is
oracle-checkable — the reference's interact path has no tests at all.

Scale: scoring is embarrassingly parallel over candidate rows (no shuffle
added — candidates are already partitioned); the rerank window shuffles
once on the query key, with WindowGroupLimit bounding output when k is
set. Cross-encoder cost is O(candidates), not O(corpus) — the whole point
of the two-stage shape.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

PairScorer = Callable[[pd.Series, pd.Series], pd.Series]


def token_jaccard_scorer(a: pd.Series, b: pd.Series) -> pd.Series:
    """Deterministic mock cross-encoder: Jaccard of whitespace token sets."""
    def score(x: str, y: str) -> float:
        sa, sb = set(str(x).split()), set(str(y).split())
        if not sa and not sb:
            return 0.0
        inter = len(sa & sb)
        return inter / (len(sa) + len(sb) - inter)
    return pd.Series([score(x, y) for x, y in zip(a, b)], dtype="float64")


def rank_candidates(
    scored: DataFrame,
    *,
    partition_cols: "list[str]",
    score_col: str,
    cand_col: str,
    k: int | None = None,
    keep_rank_no: bool = True,
) -> DataFrame:
    """The shared rerank tail: per-partition ranking by score (ties
    broken by candidate value — the engine-wide determinism rule),
    optional top-``k`` cut, 0-based ``rank_no``. One implementation so
    every rerank stage (pairwise scorer, MaxSim) cuts identically."""
    w = Window.partitionBy(*partition_cols).orderBy(
        F.col(score_col).desc(), F.col(cand_col).asc())
    ranked = scored.withColumn("__rn", F.row_number().over(w))
    if k is not None:
        ranked = ranked.filter(F.col("__rn") <= k)
    if keep_rank_no:
        ranked = ranked.withColumn("rank_no", F.col("__rn") - 1)
    return ranked.drop("__rn")


def rerank_pairs(
    candidates: DataFrame,
    scorer: PairScorer = token_jaccard_scorer,
    *,
    query_col: str = "source_item",
    cand_col: str = "sim_item",
    score_col: str = "rerank_score",
    k: int | None = None,
    keep_rank_no: bool = True,
    score_scale: int | None = None,
) -> DataFrame:
    """Re-score candidate pairs with ``scorer`` and re-rank per query.

    Input is any DataFrame of (query, candidate, *extra) rows — typically
    the output of ``knn_join`` / an ANN path. Output keeps every input
    column, adds ``score_col``, replaces ``rank_no`` with the new ranking
    (ties broken by candidate value for determinism), and cuts to ``k``
    when given.
    """
    udf = pandas_udf(scorer, "double")
    score: Column = udf(F.col(query_col), F.col(cand_col))
    if score_scale is not None:
        score = F.round(score, score_scale)
    scored = candidates.withColumn(score_col, score)
    return rank_candidates(scored, partition_cols=[query_col],
                           score_col=score_col, cand_col=cand_col,
                           k=k, keep_rank_no=keep_rank_no)
