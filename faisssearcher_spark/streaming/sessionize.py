"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin (operators/events.py::sessionize) is a lag + cumulative-sum
window; a *stream* can't window over unbounded history, so this is the
canonical custom-state shape the engine needs (SURVEY.md §2.10 —
streaming/stateful is absent in the reference; this is north-star
surface):

- groupBy(user) → per-key state = the (possibly) open session
  (start, last event ts, count, value sum);
- each micro-batch extends the open session or closes it when the gap
  exceeds the threshold, emitting CLOSED sessions downstream;
- an event-time timeout closes idle sessions once the watermark passes
  ``gap`` beyond their last event, so state is bounded by the number of
  concurrently-active users, never by history.

Scale notes: state lives in the executor state store keyed by user —
the shuffle is the same hash-by-key exchange as the batch window, and a
1000-executor run partitions state horizontally. Arrow moves each
micro-batch's rows per key in vectorized batches.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

# state: (session_start_epoch_us, last_ts_epoch_us, n_events, sum_value)
_STATE_SCHEMA = ("start_us long, last_us long, n long, sum_value double")


def sessionize_stream(stream: DataFrame, *, user_col: str = "user_id",
                      ts_col: str = "ts", value_col: str = "value",
                      gap_minutes: int = 30,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming gap sessionization; emits one row per CLOSED session.

    A session closes when (a) a later event for the same user arrives
    more than ``gap_minutes`` after its last event, or (b) the event-time
    watermark passes ``gap_minutes`` beyond its last event (timeout — no
    further event can extend it, because rows older than the watermark
    are dropped upstream).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def _update(key: Tuple[Any, ...],
                pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        (user,) = key
        closed: list[tuple[int, int, int, float]] = []

        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(ts_col)
            ts_us = rows[ts_col].astype("int64")  # pandas ts -> epoch ns
            ts_us = (ts_us // 1000).tolist()
            vals = rows[value_col].astype(float).tolist()

            if state.exists:
                start_us, last_us, n, sv = state.get
            else:
                start_us, last_us, n, sv = ts_us[0], ts_us[0], 0, 0.0

            for t, v in zip(ts_us, vals):
                if n > 0 and t - last_us > gap_us:
                    closed.append((start_us, last_us, n, sv))
                    start_us, n, sv = t, 0, 0.0
                last_us = max(last_us, t)
                n += 1
                sv += v
            state.update((start_us, last_us, n, sv))
            # no event past watermark+gap can extend this session
            state.setTimeoutTimestamp(last_us // 1000 + gap_minutes * 60 * 1000)

        if closed:
            yield pd.DataFrame({
                "user_id": [user] * len(closed),
                "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [round(c[3], 2) for c in closed],
            })

    return (
        stream.select(F.col(user_col).alias("user_id"),
                      F.col(ts_col), F.col(value_col))
        .withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout)
    )
