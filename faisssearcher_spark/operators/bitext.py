"""Margin-based bitext mining (Artetxe & Schwenk 2019,
arXiv:1811.01136 — the LASER/CCMatrix parallel-corpus mining score).

Given two embedded corpora (source/target sentences in a shared
multilingual space), raw cosine is a poor mining criterion — hubs score
high against everything. The margin criterion normalizes each pair's
cosine by the average similarity of both endpoints' k-NN neighborhoods:

    score(x, y) = cos(x, y) /
        ( avg cos(x, NN_k(x)) / 2 + avg cos(y, NN_k(y)) / 2 )

("ratio" margin; > 1 means the pair stands out of both neighborhoods).
Candidates are the union of forward (x → top-k in Y) and backward
(y → top-k in X) neighbor pairs; mining keeps score ≥ threshold,
optionally restricted to each source's best target (``best_per_src``).

Spark-first composition — no new kernel: two :func:`knn_join` calls
(each strategy-dispatched like any other search, so the corpus sides
scale exactly as vector search does), two per-id averages (partial-
aggregable), one union-distinct of candidate pairs, and two broadcast
joins to attach the neighborhood averages (id-keyed, corpus-row-sized
— broadcast while they fit, and they are one double per row). The
O(|X|·|Y|) pair space is never formed; pair volume is ≤ k·(|X|+|Y|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from faisssearcher_spark.operators.knn import knn_join

__all__ = ["margin_scores", "mine_bitext"]


def margin_scores(
    src: DataFrame,
    tgt: DataFrame,
    *,
    k: int = 4,
    src_id_col: str = "src_id",
    tgt_id_col: str = "tgt_id",
    src_vec_col: str = "embedding",
    tgt_vec_col: str = "embedding",
    strategy: str = "auto",
    score_scale: int | None = None,
) -> DataFrame:
    """``(src_id, tgt_id, cos_sim, margin)`` for every forward or
    backward k-NN candidate pair.

    ``k`` controls both the candidate pool and the neighborhood
    normalizer (the paper uses one k for both). Margins are computed
    with the candidate's exact cosine; neighborhood averages use each
    side's top-k cosines — including the candidate itself when it is a
    neighbor, per the reference formulation."""
    if k < 1:
        raise ValueError(f"k must be >= 1 (got {k})")
    s = src.select(F.col(src_id_col).alias("__sid"),
                   F.col(src_vec_col).alias("__svec"))
    t = tgt.select(F.col(tgt_id_col).alias("__tid"),
                   F.col(tgt_vec_col).alias("__tvec"))
    fwd = knn_join(
        s.select(F.col("__sid").alias("qid"), F.col("__svec")
                 .alias("embedding")),
        t.select(F.col("__tid").alias("item"), F.col("__tvec")
                 .alias("embedding")),
        metric="cos", k=k, query_item_col="qid", item_key_col="item",
        query_vec_col="embedding", item_vec_col="embedding",
        payload_cols=[], strategy=strategy)
    bwd = knn_join(
        t.select(F.col("__tid").alias("qid"), F.col("__tvec")
                 .alias("embedding")),
        s.select(F.col("__sid").alias("item"), F.col("__svec")
                 .alias("embedding")),
        metric="cos", k=k, query_item_col="qid", item_key_col="item",
        query_vec_col="embedding", item_vec_col="embedding",
        payload_cols=[], strategy=strategy)

    # per-endpoint neighborhood averages (one double per corpus row)
    src_avg = fwd.groupBy(F.col("source_item").alias("__sid")) \
        .agg(F.avg("sim_val").alias("__s_avg"))
    tgt_avg = bwd.groupBy(F.col("source_item").alias("__tid")) \
        .agg(F.avg("sim_val").alias("__t_avg"))

    cand = (fwd.select(F.col("source_item").alias("__sid"),
                       F.col("sim_item").alias("__tid"),
                       F.col("sim_val").alias("cos_sim"))
            .unionByName(
                bwd.select(F.col("sim_item").alias("__sid"),
                           F.col("source_item").alias("__tid"),
                           F.col("sim_val").alias("cos_sim")))
            .groupBy("__sid", "__tid")
            .agg(F.max("cos_sim").alias("cos_sim")))

    margin = F.col("cos_sim") / ((F.col("__s_avg") + F.col("__t_avg"))
                                 / F.lit(2.0))
    if score_scale is not None:
        margin = F.round(margin, score_scale)
    return (cand
            .join(F.broadcast(src_avg), "__sid")
            .join(F.broadcast(tgt_avg), "__tid")
            .select(F.col("__sid").alias(src_id_col),
                    F.col("__tid").alias(tgt_id_col),
                    "cos_sim", margin.alias("margin")))


def mine_bitext(
    src: DataFrame,
    tgt: DataFrame,
    *,
    k: int = 4,
    threshold: float = 1.05,
    best_per_src: bool = True,
    src_id_col: str = "src_id",
    tgt_id_col: str = "tgt_id",
    src_vec_col: str = "embedding",
    tgt_vec_col: str = "embedding",
    strategy: str = "auto",
    score_scale: int | None = None,
) -> DataFrame:
    """Mined pairs: margin ≥ ``threshold``, optionally only each
    source's best-margin target (``best_per_src`` — the max-score
    mining mode; ties break on tgt id for determinism)."""
    scored = margin_scores(
        src, tgt, k=k, src_id_col=src_id_col, tgt_id_col=tgt_id_col,
        src_vec_col=src_vec_col, tgt_vec_col=tgt_vec_col,
        strategy=strategy, score_scale=score_scale)
    out = scored.filter(F.col("margin") >= threshold)
    if best_per_src:
        w = Window.partitionBy(src_id_col).orderBy(
            F.col("margin").desc(), F.col(tgt_id_col).asc())
        out = (out.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).drop("__rn"))
    return out
