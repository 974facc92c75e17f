"""Shuffle-balance utilities: skew salting and bucketed co-located joins.

These are the two levers the 100 TB plan needs beyond AQE's automatic
handling (AQE splits skewed *partitions* at runtime, but a single
pathological key still lands in one task unless salted; and AQE cannot
remove the shuffle a repeated big-big equi-join pays — bucketing can):

- :func:`salted_join` — big-skewed ⋈ small/medium: the left side gets a
  random salt in ``[0, salts)``, the right side is replicated once per
  salt, and the join key becomes ``(key, salt)`` so one hot key spreads
  over ``salts`` tasks. Replication cost: |right| × salts rows — use for
  dimension-table joins where broadcast is too big but skew is real.
- :func:`salted_count` — skew-safe groupBy count: two-level aggregation
  (per (key, salt) partial, then per key final). Spark's own partial
  aggregation usually covers this; the explicit form documents the
  pattern for aggregates partial-agg can't shrink (e.g. collect_list).
- :func:`write_bucketed` / :func:`bucketed_table` — persist a DataFrame
  hash-bucketed by the join key. Two tables bucketed the same way join
  with NO exchange on either side (SortMergeJoin reads co-located
  buckets) — the right layout for fact-fact joins repeated every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, on: str, *,
                salts: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join ``left ⋈ right on left[on] == right[on]`` with the left
    side's hot keys spread across ``salts`` shuffle partitions.

    Semantically identical to ``left.join(right, on, how)`` for inner and
    left joins (each left row carries exactly one salt; the matching
    right replica is unique). Output columns: ``on`` plus both sides'
    non-key columns, like the plain join.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' | 'left'")
    l_salted = left.withColumn(
        "__salt", F.floor(F.rand(seed) * salts).cast("int"))
    r_replicated = right.withColumn(
        "__salt", F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(salts - 1)),
            lambda s: s.cast("int"))))
    out = l_salted.join(r_replicated, [on, "__salt"], how)
    return out.drop("__salt")


def salted_count(df: DataFrame, on: str, *, salts: int = 16,
                 seed: int = 42) -> DataFrame:
    """Skew-safe ``groupBy(on).count()`` via explicit two-level
    aggregation: partial counts per (key, salt), final sum per key."""
    partial = (
        df.withColumn("__salt", F.floor(F.rand(seed) * salts).cast("int"))
        .groupBy(on, "__salt").agg(F.count("*").alias("__c")))
    return partial.groupBy(on).agg(F.sum("__c").alias("count"))


def write_bucketed(df: DataFrame, table: str, *, bucket_col: str,
                   n_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Reading two tables bucketed by the same column into the same bucket
    count and joining on it produces a SortMergeJoin with NO Exchange on
    either side — the shuffle is paid once at write time and amortized
    over every subsequent join. At 100 TB this is the difference between
    re-shuffling the fact table every run and never shuffling it.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def skew_report(df: DataFrame, key_col: str, *, top: int = 10) -> DataFrame:
    """One-row skew diagnosis for a prospective shuffle key: row/key
    counts, per-key count quantiles, the max/avg ratio (the "how much
    bigger is the hottest task" number), and the ``top`` hottest keys as
    an array of (key, cnt) structs.

    The decision input for this module's levers: skew_ratio ≈ 1 → plain
    join/agg is fine; large ratio with a few hot keys → salt them
    (:func:`salted_join`) or let AQE split, and consider whether the hot
    keys are junk (empty strings, nulls, boilerplate) to filter instead.

    Cost: one groupBy(key) count (map-side combined) + one tiny agg over
    the per-key counts — the diagnosis never touches payload columns.
    """
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key"))
              .agg(F.count("*").alias("cnt")))
    summary = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.avg("cnt"), 2).alias("avg_key_rows"),
        F.expr("percentile_approx(cnt, array(0.5, 0.9, 0.99))")
        .alias("p50_p90_p99"),
        F.round(F.max("cnt") / F.avg("cnt"), 2).alias("skew_ratio"))
    # top keys from a TakeOrdered limit (never collect_list over the full
    # key space — that would itself be the skew hazard), then folded into
    # one array row and attached via a 1-row × 1-row cross join
    hot = (counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
           .limit(top)
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct(
                   (-F.col("cnt")).alias("neg"), "key", "cnt"))),
               lambda s: F.struct(s["key"].alias("key"),
                                  s["cnt"].alias("cnt")))
               .alias("top_keys")))
    return summary.crossJoin(hot)
