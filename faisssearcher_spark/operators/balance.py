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
