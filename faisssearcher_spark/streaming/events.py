"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.10); these are the
engine's Structured Streaming twins of the batch event operators — the
shape a production ingest pipeline needs: event-time windowed aggregation
with watermark-bounded state, and streaming exact dedup with state TTL.

Design notes for scale:
- watermarks bound state: without them a windowed agg or dedup holds state
  forever; the 1-hour default here tolerates late data up to the watermark
  and drops older arrivals (documented, deterministic);
- ``availableNow`` triggers let the same code run as an incremental batch
  job over a parquet landing zone — the test harness uses exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType, DoubleType)

#: events table schema (streams must declare schemas — no inference)
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """Read an events parquet directory as a stream.

    NB: ``ts`` may be written as TIMESTAMP(NANOS) (which Spark's reader
    rejects), legacy INT96/adjusted micros (a Spark writer re-landing the
    stream — reads natively as TIMESTAMP), or plain naive MICROS/MILLIS;
    the same footer probe as the batch catalog picks the declared
    schema — LongType + the ``nanosAsLong`` conf for NANOS files,
    TIMESTAMP for instants, TIMESTAMP_NTZ otherwise — and every branch
    normalizes to TIMESTAMP (session tz is pinned UTC, so the instant is
    identical either way).
    """
    import os

    from pyspark.sql.types import TimestampNTZType

    from faisssearcher_spark.sources.catalog import _events_ts_kind

    kind = _events_ts_kind(path)
    is_nanos = kind == "nanos"
    ts_type = (LongType() if is_nanos
               else TimestampType() if kind == "instant"
               else TimestampNTZType())
    if is_nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = StructType([
        f if f.name != "ts" else StructField("ts", ts_type)
        for f in EVENTS_SCHEMA.fields])
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # the file stream source rejects plain file paths ("basePath must
        # be a directory") but accepts globs; [x]-escape the basename's
        # first char so the glob matches exactly this file
        d, base = os.path.split(path)
        path = os.path.join(d, f"[{base[0]}]{base[1:]}")
    df = reader.parquet(path)
    if is_nanos:
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_event_counts(stream: DataFrame, *, window: str = "1 hour",
                          watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window counts per event_type with a watermark.

    State per (window, type) is dropped once the watermark passes the
    window end; late rows beyond the watermark are discarded — the
    standard bounded-state streaming aggregation.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
                "event_type", "n_events", "sum_value")
    )


def streaming_dedup(stream: DataFrame, *, key_cols: list[str] | None = None,
                    watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: first occurrence wins, duplicate arrivals
    within the watermark horizon are dropped; state expires with the
    watermark (``dropDuplicatesWithinWatermark``)."""
    keys = key_cols or ["event_id"]
    return (stream.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(keys))


def run_to_memory(stream_df: DataFrame, query_name: str,
                  output_mode: str = "append") -> None:
    """Drain a stream into an in-memory table with an availableNow trigger
    (blocks until all currently-available input is processed). Test/dev
    helper — production sinks are kafka/delta/parquet writeStream targets."""
    q = (stream_df.writeStream.format("memory")
         .queryName(query_name).outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
