"""Idempotent streaming sinks (exactly-once landing on replay).

Structured Streaming guarantees at-least-once delivery to ``foreachBatch``:
after a crash between "batch written" and "offset committed", the SAME
epoch is re-delivered with the SAME ``batch_id``. Exactly-once therefore
reduces to making the per-epoch write idempotent — here, each epoch
OVERWRITES its own hive-style partition directory
(``<path>/batch_id=<n>``), so a replayed epoch replaces itself instead of
appending duplicates. This is the standard file-sink transactional
pattern (what Delta's txn log generalizes) built from parquet alone.

Scale notes:
- one directory per epoch keeps the commit unit small and the replay
  blast radius a single micro-batch; compact epochs downstream if small
  files accumulate (a batch ``chunk``/``pack`` job — operators/sampling);
- readers get the epoch id for free as the ``batch_id`` partition column
  (`spark.read.parquet(path)` discovers it), and partition pruning on it
  makes incremental downstream consumption a pushed filter;
- the checkpoint directory is the source of truth for WHICH epochs are
  committed — never share one checkpoint across two queries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def idempotent_parquet_sink(stream_df: DataFrame, *, path: str,
                            checkpoint_dir: str,
                            query_name: str = "idempotent_parquet_sink",
                            available_now: bool = True) -> StreamingQuery:
    """Start a foreachBatch parquet sink whose epochs are replay-safe.

    Returns the started :class:`StreamingQuery`; with
    ``available_now=True`` (the incremental-batch shape), call
    ``awaitTermination()`` to drain currently-available input.
    """

    def _write_epoch(batch_df: DataFrame, batch_id: int) -> None:
        (batch_df.write.mode("overwrite")
         .parquet(os.path.join(path, f"batch_id={batch_id}")))

    writer = (stream_df.writeStream.foreachBatch(_write_epoch)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read everything the sink has landed; ``batch_id`` arrives as a
    partition column (pruned when filtered). Refreshes Spark's file-status
    cache first — an epoch replay OVERWRITES its directory with new part
    files, and a reader that listed the old names would fail with
    FILE_NOT_EXIST."""
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def compact_sink(spark: SparkSession, path: str, dest: str, *,
                 target_file_bytes: int = 128 << 20) -> int:
    """Compact a sink's accumulated epoch directories into evenly-sized
    parquet files at ``dest`` — the periodic maintenance job that fixes
    the small-files problem every per-epoch landing zone develops (one
    directory per micro-batch → thousands of KB-scale files → listing
    and open() overhead dominates scans at 100 TB).

    File count comes from Catalyst's size estimate over the actual data
    (≈ size / target_file_bytes, minimum 1); when the estimate is
    unavailable the on-disk byte size of the landing zone stands in (with
    a warning) rather than silently writing one file. The write is a
    plain ``repartition(n)`` overwrite of ``dest`` — run it from ONE
    scheduled job, then point readers at ``dest`` and truncate the
    landing zone. ``dest`` must differ from ``path``: an in-place
    overwrite would destroy the very directories the job is reading.
    Returns the number of files written.
    """
    import warnings

    from faisssearcher_spark.plans.inspect import plan_size_bytes

    if target_file_bytes < 1:
        raise ValueError("target_file_bytes must be >= 1")
    if os.path.abspath(dest) == os.path.abspath(path):
        raise ValueError(
            f"compact_sink dest must differ from the landing zone "
            f"({path!r}): overwriting the directory being read would "
            f"destroy the sink mid-scan")
    df = read_sink(spark, path).drop("batch_id")
    est = plan_size_bytes(df)
    if not est:
        # Catalyst estimate missing — fall back to summing the landing
        # zone's actual parquet bytes so n_files still tracks data size.
        est = sum(os.path.getsize(os.path.join(root, name))
                  for root, _, names in os.walk(path) for name in names
                  if name.endswith(".parquet"))
        warnings.warn(
            "compact_sink: no Catalyst size estimate for the landing "
            f"zone; using on-disk parquet bytes ({est}) to size files",
            stacklevel=2)
    n_files = max(1, -(-est // target_file_bytes)) if est else 1
    df.repartition(n_files).write.mode("overwrite").parquet(dest)
    return n_files
