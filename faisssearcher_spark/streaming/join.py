"""Stream-stream joins with watermark-bounded state.

The one streaming join family the engine did not yet cover: BOTH sides
arrive continuously (clicks ↔ impressions, orders ↔ payments, request ↔
response logs) and rows must pair within a time bound. Structured
Streaming executes this as a stateful equi-join: each side co-partitions
by the join key, unmatched rows wait in keyed state, and the
watermark + time-range condition is what lets that state be EVICTED —
without both, state grows without bound and the query is rejected (inner
joins run but leak state; outer joins are refused outright).

Scale shape at 100 TB/day:

- one shuffle per side on the join key per micro-batch — the same
  partitioning every stateful op uses, so AQE/bucketing arguments don't
  apply; key skew hurts here exactly like a batch join (salt upstream);
- state size ≈ input rate × (watermark horizon + interval width) per
  side — the two knobs; a 1 h horizon over a 10 M-row/h stream keeps
  ~10 M rows of keyed state per side, independent of total history;
- event-time columns must survive into the output when downstream
  windowed aggregations follow (Spark chains them via the watermark).

The batch twin of this operator is ``operators/temporal.range_join`` —
same pairing semantics, so correctness is checkable against the batch
result on a replayed corpus (pinned in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join_streams"]

_ALLOWED = ("inner", "leftOuter", "rightOuter", "fullOuter")


def interval_join_streams(left: DataFrame, right: DataFrame, *,
                          key: str,
                          left_ts: str = "ts", right_ts: str = "ts",
                          lower: str = "0 seconds",
                          upper: str = "15 minutes",
                          left_watermark: str = "30 minutes",
                          right_watermark: str = "30 minutes",
                          how: str = "inner") -> DataFrame:
    """Join two STREAMING frames on ``key`` where the right event lands
    in ``[left_ts + lower, left_ts + upper]``.

    Both sides get watermarks (state-eviction contract); the interval
    rides the join condition so Spark can bound the keyed state. Columns
    from the right side are suffixed ``_r`` where they collide (the key
    stays unsuffixed; both timestamps are kept — downstream windows may
    anchor on either, subject to its watermark).

    ``how``: inner / leftOuter / rightOuter / fullOuter — outer rows
    emit with nulls only after the other side's watermark passes the
    interval, i.e. results are LATE by up to the horizon; that latency
    is the price of a correct outer join on unbounded input.
    """
    if how not in _ALLOWED:
        raise ValueError(f"how must be one of {_ALLOWED}, got {how!r}")
    if not left.isStreaming or not right.isStreaming:
        raise ValueError(
            "both sides must be streaming frames — for stream-static "
            "use streaming/enrich.py, for batch-batch use "
            "operators/temporal.range_join")
    lcols = set(left.columns)
    renames = {c: f"{c}_r" for c in right.columns
               if c in lcols and c != key}
    r = right
    for old, new in renames.items():
        r = r.withColumnRenamed(old, new)
    r_ts = renames.get(right_ts, right_ts)
    lw = left.withWatermark(left_ts, left_watermark)
    rw = r.withWatermark(r_ts, right_watermark)
    cond = (
        (lw[key] == rw[key])
        & F.expr(f"{r_ts} >= {left_ts} + INTERVAL {lower}")
        & F.expr(f"{r_ts} <= {left_ts} + INTERVAL {upper}")
    )
    joined = lw.join(rw, cond, how)
    # one key column in the output (outer joins need the coalesce: the
    # null side's key is null)
    return joined.drop(rw[key]) if how == "inner" else (
        joined.withColumn("__k", F.coalesce(lw[key], rw[key]))
        .drop(lw[key]).drop(rw[key]).withColumnRenamed("__k", key))
