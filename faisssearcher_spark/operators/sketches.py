"""Mergeable sketch summaries — the fixed-size answer to 100 TB analytics.

At scale, three counting problems stop fitting exact machinery:

- **distinct counts over re-groupable dimensions** — pre-compute one HLL
  sketch per fine-grained cell (e.g. per event_type × day), store the
  few-KB sketches, and answer any coarser rollup later by UNIONING
  sketches instead of rescanning 100 TB (`hll_sketches` / `hll_rollup`,
  on Spark's Apache DataSketches HLL functions);
- **frequency estimates over unbounded key spaces** — a count-min sketch
  collapses billions of distinct n-grams into a ``depth × width`` cell
  grid with a one-sided error guarantee (estimate ≥ true count, over by
  at most ~N/width with probability 1−2^−depth). `cms_table` builds the
  grid RELATIONALLY (explode → hash-aggregate with map-side combine, at
  most depth·width rows leave each partition) with md5-derived bucket
  hashes, so a DuckDB SQL twin reproduces every cell bit-for-bit — the
  sketch itself is oracle-checkable, unlike opaque binary sketches;
- **heavy hitters without a full-key shuffle** — `heavy_hitters` finds
  candidates with a per-Arrow-batch local top-m scan (output bounded by
  m per batch, nothing item-keyed shuffles) and then computes EXACT
  counts for the candidate set only (broadcast semi-join + partial agg),
  so the shuffle is proportional to candidate occurrences, not distinct
  keys.

All three are mergeable/incremental by construction, which is what makes
them streaming- and multi-day-pipeline-safe: sketches from yesterday's
partition union with today's.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from faisssearcher_spark.functions.text import md5_int

# ---------------------------------------------------------------------------
# HyperLogLog: pre-aggregated, re-groupable distinct counts
# ---------------------------------------------------------------------------


def hll_sketches(df: DataFrame, group_cols: Sequence[str], value_col: str,
                 *, lg_k: int = 12, sketch_col: str = "hll") -> DataFrame:
    """One HLL sketch per group: ``group_cols... + <sketch_col> binary``.

    This is the materialization half of the sketch pattern: compute at
    the finest grain once (cheap — sketches partial-aggregate map-side),
    persist the few-KB sketches, and serve every coarser distinct-count
    rollup from :func:`hll_rollup` without touching the raw data again.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col))


def hll_rollup(sketch_df: DataFrame, group_cols: Sequence[str],
               *, sketch_col: str = "hll",
               out_col: str = "n_distinct_approx") -> DataFrame:
    """Re-aggregate stored sketches to a coarser grouping: union the
    sketches per output group and estimate. Never rescans the base data —
    the whole point of storing sketches instead of counts (distinct
    counts don't add; sketches do)."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    return sketch_df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias(out_col))


# ---------------------------------------------------------------------------
# Count-min sketch, relationally (oracle-checkable md5 bucket hashes)
# ---------------------------------------------------------------------------


def _cms_bucket(c: Column, row_idx: int, width: int, salt: str) -> Column:
    """Bucket of ``c`` in CMS row ``row_idx``: md5-derived (cross-engine
    deterministic — DuckDB computes the identical value from
    ``('0x'||substring(md5('<salt>|<i>|'||x),1,8))::BIGINT % width``)."""
    return md5_int(
        F.concat_ws("|", F.lit(salt), F.lit(row_idx), c)) % F.lit(width)


def cms_table(df: DataFrame, col: str | Column, *, depth: int = 4,
              width: int = 1024, salt: str = "cms") -> DataFrame:
    """Count-min sketch of the values in ``col`` as a cell table
    ``(row_idx, bucket, cnt)`` — at most ``depth × width`` rows total.

    Plan shape: each input row explodes into ``depth`` (row, bucket)
    cells, then a hash aggregate counts cells. Partial aggregation
    combines map-side, so no matter how many billions of values stream
    in, at most ``depth × width`` rows leave each partition — the
    fixed-size-summary property that makes the sketch usable where a
    full ``groupBy(key)`` would shuffle the whole key space.

    Guarantee (standard CMS): for any value, the estimate from
    :func:`cms_lookup` is ≥ its true count, and exceeds it by more than
    ``e·N/width`` with probability at most ``e^−depth``.
    """
    c = F.col(col) if isinstance(col, str) else col
    cell = F.explode(F.array(*[
        F.struct(F.lit(i).alias("row_idx"),
                 _cms_bucket(c, i, width, salt).alias("bucket"))
        for i in range(depth)])).alias("cell")
    # NULL values are excluded (the heavy_hitters discipline): concat_ws
    # would silently hash a NULL like '', while the documented DuckDB
    # twin's '||' propagates NULL — sketching nulls would break the
    # bit-for-bit cross-engine contract (r5 ADVICE #3)
    return (df.where(c.isNotNull()).select(cell)
            .select("cell.row_idx", "cell.bucket")
            .groupBy("row_idx", "bucket")
            .agg(F.count("*").alias("cnt")))


def cms_lookup(cms: DataFrame, items: DataFrame, col: str | Column, *,
               depth: int = 4, width: int = 1024, salt: str = "cms",
               out_col: str = "cms_est") -> DataFrame:
    """Point-query the sketch for every row of ``items``: appends
    ``out_col`` = min over the ``depth`` cells the item hashes into
    (0 when a cell is empty, NULL for a NULL key — nulls are never
    sketched, matching the NULL-propagating DuckDB twin).
    ``depth/width/salt`` must match the fit.

    The cell table is ≤ depth·width rows — always broadcast — so lookup
    adds no shuffle to the items side at any scale. ``items`` rows should
    be distinct (the typical input is a top-k candidate list); duplicate
    rows collapse through the per-item group-by.
    """
    for reserved in ("__cms_row", "__cms_bucket", "__cms_probe", out_col):
        if reserved in items.columns:
            raise ValueError(f"items already has a column named {reserved!r}")
    c = F.col(col) if isinstance(col, str) else col
    probes = (items.withColumn("__cms_probe", F.explode(F.array(*[
        F.struct(F.lit(i).alias("row_idx"),
                 _cms_bucket(c, i, width, salt).alias("bucket"))
        for i in range(depth)])))
        .select(*items.columns,
                F.col("__cms_probe.row_idx").alias("__cms_row"),
                F.col("__cms_probe.bucket").alias("__cms_bucket")))
    est = (probes
           .join(F.broadcast(cms),
                 (F.col("__cms_row") == cms["row_idx"])
                 & (F.col("__cms_bucket") == cms["bucket"]),
                 "left")
           .groupBy(*items.columns)
           .agg(F.min(F.coalesce(cms["cnt"], F.lit(0))).alias(out_col)))
    return est.withColumn(
        out_col, F.when(c.isNull(), F.lit(None).cast("long"))
                  .otherwise(F.col(out_col)))


# ---------------------------------------------------------------------------
# Heavy hitters with bounded shuffle
# ---------------------------------------------------------------------------


def heavy_hitters(df: DataFrame, col: str, *, k: int = 20,
                  candidates_per_batch: int | None = None,
                  exact: bool = False) -> DataFrame:
    """Top-``k`` most frequent values of ``col`` with EXACT counts,
    without shuffling the full key space.

    Two passes:

    1. **candidates** — a ``mapInPandas`` scan emits each Arrow batch's
       local top-``m`` values (``m = candidates_per_batch``, default
       ``4·k``); output is ≤ m rows per batch regardless of how many
       distinct values the batch holds, and nothing else moves.
    2. **exact counts** — the (tiny, distinct) candidate set broadcasts
       back as a semi-join filter; counting the surviving rows
       partial-aggregates map-side, so the shuffle carries at most
       |candidates| rows per partition.

    Contract: counts for returned values are exact. A value is
    guaranteed to be found if it ranks in the top-``m`` of at least one
    Arrow batch — always true for genuinely heavy hitters under
    Zipf-like skew (a global heavy hitter is locally heavy somewhere);
    an adversarially uniform spread can hide a marginal top-k item, so
    ``exact=True`` falls back to the plain full ``groupBy`` when the key
    space is known to fit. NULL values are excluded on BOTH paths (the
    pandas candidate scan drops NaN, so counting nulls only on the exact
    path would make the two contracts disagree).
    """
    vals = (df.select(F.col(col).cast("string").alias("item"))
            .filter(F.col("item").isNotNull()))
    if exact:
        return (vals.groupBy("item")
                .agg(F.count("*").alias("freq"))
                .orderBy(F.col("freq").desc(), F.col("item").asc())
                .limit(k))
    m = candidates_per_batch or 4 * k

    def _local_top(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vc = pdf["item"].value_counts().head(m)
            yield pd.DataFrame({"item": vc.index.astype(object)})

    cand = vals.mapInPandas(_local_top, "item string").distinct() \
        .withColumnRenamed("item", "cand_item")
    return (vals.join(F.broadcast(cand),
                      vals["item"] == F.col("cand_item"), "inner")
            .groupBy("item")
            .agg(F.count("*").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("item").asc())
            .limit(k))
