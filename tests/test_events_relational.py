"""Native session_window sessionizer vs the lag+cumsum implementation."""

import pytest  # noqa: F401
from pyspark.sql import functions as F


class TestSessionizeNative:
    def test_matches_window_scan_sessionizer(self, spark, sf_dir):
        """The built-in session_window aggregate must produce the same
        sessions as the lag+cumsum implementation on the driver data
        (no inter-event gap of exactly 30 minutes exists there — the one
        boundary where the two semantics legitimately diverge)."""
        from faisssearcher_spark.operators import events as ev
        from faisssearcher_spark.sources.catalog import load_table

        events = load_table(spark, sf_dir, "events")
        a = ev.sessionize(events, gap_minutes=30).select(
            "user_id", "n_events", "session_start", "session_end")
        b = ev.sessionize_native(events, gap_minutes=30)
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect()))

    def test_splits_at_gap(self, spark):
        from faisssearcher_spark.operators import events as ev
        rows = [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
                (1, "2024-01-01 01:00:00"),  # 50 min gap → new session
                (2, "2024-01-01 00:00:00")]
        df = spark.createDataFrame(rows, "user_id long, ts string") \
            .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        out = ev.sessionize_native(df, gap_minutes=30).collect()
        per_user = {}
        for r in out:
            per_user.setdefault(r["user_id"], []).append(r["n_events"])
        assert sorted(per_user[1]) == [1, 2]
        assert per_user[2] == [1]
