"""SparkSession factory with engine defaults.

Defaults are chosen for the local[32] test harness but every knob is the
one you would also set on a 1000-executor cluster:

- AQE on (runtime re-planning, skew-join splitting, shuffle coalescing);
- shuffle partitions sized to the parallelism at hand (cluster deployments
  should size this to 2-3x total cores, or rely on AQE coalescing);
- Arrow enabled so pandas_udf / mapInPandas stages stream columnar batches
  instead of pickled rows;
- session timezone pinned to UTC so timestamp semantics are stable across
  driver, executors, and the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Never silently produce a cartesian product by accident; the knn
    # operator requests its cross joins explicitly via crossJoin().
    "spark.sql.crossJoin.enabled": "true",
    # NOT set (r14, measured): spark.sql.join.preferSortMergeJoin=false
    # (guide §3.1 — let the planner pick shuffled-hash joins) read
    # neutral-to-worse on the join-heavy legs in interleaved iso pairs
    # with flat controls (ngram_jaccard 1.55→1.75, text_fingerprints
    # 5.34→6.13, curate 5.56→6.01): at this shape the sorts SMJ pays
    # are over AQE-coalesced tiny partitions while SHJ's per-partition
    # hash maps add allocation churn. Revisit on real cluster data.
}


def get_spark(app_name: str = "faisssearcher_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Make this package importable inside Python workers regardless of the
    # driver script's cwd (workers unpickle UDF closures by module name).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in ENGINE_CONF.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
