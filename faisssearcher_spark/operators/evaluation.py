"""Retrieval quality evaluation: recall / precision / MRR / AP / nDCG@k.

An ANN-engine replacement needs to *measure* how approximate its indexes
are: the reference's users validate a FAISS index by comparing its
results against brute-force search over the same corpus (the workflow
behind the recall contracts already gated in ``ann_ivf_recall``). This
module generalizes that one-number recall into the standard ranked-
retrieval metric suite over any (results, truth) pair of DataFrames:

    recall@k      |relevant retrieved in top-k| / |relevant|
    precision@k   |relevant retrieved in top-k| / k
    rr            1 / (1 + rank of first relevant)       (MRR per query)
    ap@k          mean over relevant ranks of precision-at-that-rank,
                  normalized by min(|relevant|, k)        (MAP per query)
    ndcg@k        DCG@k / IDCG@k with binary gains and the standard
                  1/log2(rank+2) discount

Spark-first shape: one (query, item) equi-join of results against truth
— both frames are *candidate-sized* (n_queries × k rows, independent of
corpus size), so the join and the per-query groupBy that follows cost
O(n_queries·k) however large the corpus the results came from. No
broadcast hint is forced (the r7 bitext lesson): AQE broadcasts the
truth side when its estimate fits.

Engine-portability of the floats: every metric is either a single
integer division (recall, precision, rr — bit-identical across IEEE-754
engines) or a short sum of values drawn from a *literal* discount table
precomputed in Python (``dcg_discounts`` / ``idcg_totals``) — the same
shortest-repr decimals are embedded in both the Spark plan and any SQL
twin, so both engines parse the identical doubles; only the ≤k-term sum
order can differ, absorbed by ``round(·, round_to)`` (the house rule,
NOTES.md). log2 is never evaluated at query time by either engine.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["dcg_discounts", "idcg_totals", "retrieval_metrics",
           "summarize_retrieval"]


def dcg_discounts(k: int) -> list[float]:
    """The binary-gain DCG discount table: ``w[r] = 1/log2(r+2)`` for
    0-based rank r in [0, k). Computed once in Python so every consumer
    (the Spark plan, a DuckDB oracle) embeds the *same* double literals
    instead of trusting two libm ``log2`` implementations to agree."""
    return [1.0 / math.log2(r + 2) for r in range(k)]


def idcg_totals(k: int) -> list[float]:
    """Cumulative ideal DCG: ``idcg[m-1]`` is the DCG of m relevant items
    ranked perfectly, for m in [1, k]. Fixed left-to-right summation in
    Python — a single literal per m, no runtime float sum at all."""
    out, acc = [], 0.0
    for w in dcg_discounts(k):
        acc += w
        out.append(acc)
    return out


def retrieval_metrics(results: DataFrame, truth: DataFrame, *,
                      k: int,
                      query_col: str = "source_item",
                      item_col: str = "sim_item",
                      rank_col: str = "rank_no",
                      round_to: int = 4) -> DataFrame:
    """Per-query ranked-retrieval metrics of ``results`` against ``truth``.

    ``results`` carries (query_col, item_col, rank_col) with 0-based
    ranks (the engine's knn/ann output shape); rows with rank >= k are
    ignored. ``truth`` carries (query_col, item_col) — the relevant set
    per query (e.g. brute-force top-m). Every query present in *truth*
    gets a row; queries with zero retrieved hits score 0 everywhere.

    Returns one row per query:
    (query_col, n_rel, n_hits, recall_at_k, precision_at_k, rr, ap, ndcg).

    Both inputs are referenced in more than one branch of the plan
    (truth feeds the n_rel count and the hits join) — when they are
    expensive pipelines rather than stored tables, persist them first or
    Spark recomputes the lineage per branch.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    disc = dcg_discounts(k)
    ideal = idcg_totals(k)

    rel = truth.select(query_col, item_col).dropDuplicates(
        [query_col, item_col])
    n_rel = rel.groupBy(query_col).agg(F.count(F.lit(1)).alias("n_rel"))

    # Candidate-sized inner join: which retrieved rows are relevant.
    # The results side dedups to its best (lowest) rank per (query,
    # item) — a fused/unioned result frame repeating an item at two
    # ranks must count one hit, not two (metrics > 1.0 otherwise).
    hits = (results
            .filter(F.col(rank_col) < k)
            .groupBy(query_col, item_col)
            .agg(F.min(rank_col).alias("__rank"))
            .join(rel, on=[query_col, item_col]))

    # precision at each hit's rank needs the count of hits at or above it
    # — a per-query window over the (tiny) hit frame, then one groupBy.
    w = Window.partitionBy(query_col).orderBy("__rank")
    disc_arr = F.array(*[F.lit(x) for x in disc])
    per_hit = hits.withColumn("__nth", F.row_number().over(w)).select(
        query_col,
        "__rank",
        (F.col("__nth").cast("double")
         / (F.col("__rank") + F.lit(1)).cast("double")).alias("__prec"),
        F.element_at(disc_arr, (F.col("__rank") + 1).cast("int"))
        .alias("__disc"))
    agg = per_hit.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("__rank").alias("__first"),
        F.sum("__prec").alias("__ap_sum"),
        F.sum("__disc").alias("__dcg"))

    ideal_arr = F.array(*[F.lit(x) for x in ideal])
    joined = (n_rel.join(agg, on=query_col, how="left")
              .na.fill({"n_hits": 0}))
    m = F.least(F.col("n_rel"), F.lit(k))
    return joined.select(
        query_col,
        "n_rel",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_rel"), round_to)
        .alias("recall_at_k"),
        F.round(F.col("n_hits") / F.lit(float(k)), round_to)
        .alias("precision_at_k"),
        F.round(F.when(F.col("__first").isNotNull(),
                       F.lit(1.0) / (F.col("__first") + F.lit(1)))
                .otherwise(F.lit(0.0)), round_to).alias("rr"),
        F.round(F.coalesce(F.col("__ap_sum"), F.lit(0.0)) / m, round_to)
        .alias("ap"),
        F.round(F.coalesce(F.col("__dcg"), F.lit(0.0))
                / F.element_at(ideal_arr, m.cast("int")), round_to)
        .alias("ndcg"),
    )


def summarize_retrieval(per_query: DataFrame, *,
                        query_col: str = "source_item",
                        round_to: int = 4) -> DataFrame:
    """Macro-average the per-query frame from :func:`retrieval_metrics`
    into one row: (n_queries, recall_at_k, precision_at_k, mrr, map,
    ndcg). Plain partial-aggregable means — one reduction, no shuffle of
    anything corpus-sized."""
    metric_cols = ["recall_at_k", "precision_at_k", "rr", "ap", "ndcg"]
    out_names = ["recall_at_k", "precision_at_k", "mrr", "map", "ndcg"]
    aggs = [F.count(F.lit(1)).alias("n_queries")] + [
        F.round(F.avg(c), round_to).alias(o)
        for c, o in zip(metric_cols, out_names)]
    return per_query.agg(*aggs)
