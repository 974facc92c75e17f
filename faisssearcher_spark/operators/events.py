"""Event-stream operators (batch forms; streaming twins in streaming/).

Beyond-reference surface: the reference has no time/JSON/windowed
semantics (SURVEY.md §2.10); these give the engine the event-pipeline
operations of a production analytics stack, all as Catalyst plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame, *, ts_col: str = "ts",
                  type_col: str = "event_type",
                  value_col: str = "value") -> DataFrame:
    """Tumbling 1-hour event-time rollup: count + value sum/avg per
    (hour, event_type). Single hash aggregation; partial aggregation
    (map-side combine) keeps the shuffle at |hours × types| rows."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", F.col(ts_col)),
                          "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col(type_col).alias("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(value_col), 2).alias("sum_value"),
             F.round(F.avg(value_col), 4).alias("avg_value"))
    )


def json_props(events: DataFrame, *, props_col: str = "props",
               field: str = "k") -> DataFrame:
    """Extract a JSON field from the props payload and aggregate per
    event_type. get_json_object evaluates JVM-side (Jackson), no UDF."""
    return (
        events.withColumn(
            "prop_val",
            F.get_json_object(F.col(props_col), f"$.{field}").cast("long"))
        .groupBy("event_type")
        .agg(F.count("prop_val").alias("n_with_prop"),
             F.sum("prop_val").alias("sum_prop"),
             F.max("prop_val").alias("max_prop"))
    )


def sessionize(events: DataFrame, *, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Classic lag + cumulative-sum
    windows — one shuffle keyed by user, then per-user ordered scan.

    Returns per-session rows: (user_id, session_id, n_events,
    session_start, session_end).
    """
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w_user)
    with_break = events.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0))
    with_sid = with_break.withColumn(
        "session_seq", F.sum("__new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (
        with_sid.groupBy(F.col(user_col), F.col("session_seq"))
        .agg(F.count("*").alias("n_events"),
             F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
             F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"))
        .withColumnRenamed("session_seq", "session_id")
    )


def sessionize_native(events: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts",
                      gap_minutes: int = 30) -> DataFrame:
    """Gap sessionization via Spark's built-in ``session_window``
    aggregation — one hash aggregate with codegen'd session merging, no
    analytic window scan. Same output shape as :func:`sessionize` minus
    ``session_id`` (the native operator does not number sessions; derive
    one with ``row_number`` over (user, session_start) if needed).

    Boundary semantics differ at EXACTLY the gap: ``session_window``
    closes a session when the next event lands at or after
    ``last_ts + gap`` (splits on gap ≥ g), while :func:`sessionize`
    splits on gap > g — events at the exact boundary belong to the
    previous session there and to a new one here. Anywhere off that
    measure-zero boundary the two agree row for row.

    Prefer this form when session ids are not needed: the aggregate
    pre-merges map-side and avoids the full per-user ordered scan, and
    the same expression works in Structured Streaming group-bys.
    """
    sw = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (events.groupBy(F.col(user_col), sw.alias("__w"))
            .agg(F.count("*").alias("n_events"),
                 F.date_format(F.min(ts_col),
                               "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                 F.date_format(F.max(ts_col),
                               "yyyy-MM-dd HH:mm:ss").alias("session_end"))
            .drop("__w"))


def resample_fill_forward(events: DataFrame, *, key_col: str = "user_id",
                          ts_col: str = "ts", value_col: str = "value",
                          step_s: int = 3600, agg: str = "avg",
                          out_col: str = "value") -> DataFrame:
    """Regularize an irregular event stream onto a fixed time grid with
    forward-fill — the standard prep for feature windows and charting:
    one row per (key, step) from the key's first to last event, carrying
    the step's aggregate when events landed in it, else the most recent
    earlier value.

    Plan (three shuffles, all on the key): per-(key, bucket) aggregate
    (map-side combined), per-key span → ``sequence`` explode builds the
    dense grid (span/step rows per key — bound the step to the span you
    actually need), left join of grid to aggregates (co-located: both
    sides hash by the same key), and one ordered window whose
    ``last(value, ignorenulls=True)`` implements the fill. The first
    grid row per key always has data (the grid starts at the first
    event's bucket), so forward-fill never emits leading nulls.
    """
    if step_s <= 0:
        raise ValueError("step_s must be positive")
    allowed = {"avg", "sum", "min", "max", "count", "last"}
    if agg not in allowed:
        raise ValueError(f"agg must be one of {sorted(allowed)}")
    t = F.col(ts_col).cast("timestamp").cast("double")
    bucket = (F.floor(t / step_s) * step_s).cast("long")
    with_bucket = events.withColumn("__bucket", bucket)
    if agg == "count":
        agg_expr = F.count("*")
    elif agg == "last":
        agg_expr = F.max_by(F.col(value_col), F.col(ts_col))
    else:
        agg_expr = getattr(F, agg)(F.col(value_col))
    binned = (with_bucket.groupBy(F.col(key_col).alias("key"), "__bucket")
              .agg(agg_expr.alias("__v")))
    spans = binned.groupBy("key").agg(F.min("__bucket").alias("__b0"),
                                      F.max("__bucket").alias("__b1"))
    grid = spans.select(
        "key", F.explode(F.sequence("__b0", "__b1",
                                    F.lit(step_s).cast("long")))
        .alias("__bucket"))
    w = (Window.partitionBy("key").orderBy("__bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(binned, ["key", "__bucket"], "left")
            .select(F.col("key").alias(key_col),
                    F.timestamp_seconds("__bucket").alias("bucket_ts"),
                    F.last("__v", ignorenulls=True).over(w).alias(out_col)))
