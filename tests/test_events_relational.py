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


class TestKAnonymity:
    def test_report_and_suppression(self, spark):
        from faisssearcher_spark.operators.privacy import (
            k_anonymity_report, suppress_below_k)
        rows = ([("94110", 1980)] * 5 + [("94110", 1990)] * 3
                + [("10001", 1985)])
        df = spark.createDataFrame(rows, "zip string, yob int")
        r = k_anonymity_report(df, ["zip", "yob"], k=4).first()
        assert (r["n_rows"], r["n_groups"]) == (9, 3)
        assert r["min_group_size"] == 1
        assert r["n_violating_groups"] == 2
        assert r["n_violating_rows"] == 4
        assert r["is_k_anonymous"] is False

        kept = suppress_below_k(df, ["zip", "yob"], k=4)
        assert kept.count() == 5
        r2 = k_anonymity_report(kept, ["zip", "yob"], k=4).first()
        assert r2["is_k_anonymous"] is True

    def test_null_quasi_group_survives_when_large(self, spark):
        """A NULL quasi value is a real group to groupBy, so the
        null-safe semi join must keep a large all-NULL group and
        suppress a small one (r6 ADVICE: a plain equi-join silently
        dropped every NULL row regardless of group size)."""
        from faisssearcher_spark.operators.privacy import suppress_below_k
        rows = ([(None, "a")] * 4 + [("z1", None)] * 1 + [("z2", "b")] * 3)
        df = spark.createDataFrame(rows, "zip string, src string")
        kept = suppress_below_k(df, ["zip", "src"], k=3)
        got = sorted(((r["zip"] or "", r["src"] or "")
                      for r in kept.collect()))
        assert got == [("", "a")] * 4 + [("z2", "b")] * 3

    def test_empty_frame_is_anonymous(self, spark):
        from faisssearcher_spark.operators.privacy import k_anonymity_report
        df = spark.createDataFrame([], "zip string, yob int")
        r = k_anonymity_report(df, ["zip"], k=3).first()
        assert r["is_k_anonymous"] is True and r["n_rows"] == 0

    def test_validation(self, spark):
        from faisssearcher_spark.operators.privacy import (
            k_anonymity_report, suppress_below_k)
        df = spark.createDataFrame([("a",)], "x string")
        import pytest as _pt
        with _pt.raises(ValueError, match="non-empty"):
            k_anonymity_report(df, [])
        with _pt.raises(ValueError, match="k must be"):
            suppress_below_k(df, ["x"], k=1)


class TestResampleFillForward:
    def test_grid_and_fill(self, spark):
        from faisssearcher_spark.operators.events import resample_fill_forward
        # user 1: events at minute 0 (v=2) and minute 3 (v=8); step 60 s
        rows = [(1, 0.0, 2.0), (1, 185.0, 8.0), (2, 60.0, 5.0)]
        df = spark.createDataFrame(rows, "user_id long, ts double, value double")
        out = resample_fill_forward(df, step_s=60).orderBy(
            "user_id", "bucket_ts").collect()
        u1 = [(r["bucket_ts"].minute, r["value"]) for r in out
              if r["user_id"] == 1]
        # minutes 0..3: value at 0, filled 1-2, fresh at 3
        assert u1 == [(0, 2.0), (1, 2.0), (2, 2.0), (3, 8.0)]
        u2 = [(r["bucket_ts"].minute, r["value"]) for r in out
              if r["user_id"] == 2]
        assert u2 == [(1, 5.0)]

    def test_agg_modes(self, spark):
        from faisssearcher_spark.operators.events import resample_fill_forward
        rows = [(1, 10.0, 4.0), (1, 20.0, 6.0)]
        df = spark.createDataFrame(rows, "user_id long, ts double, value double")
        avg = resample_fill_forward(df, step_s=60, agg="avg").first()
        assert avg["value"] == 5.0
        last = resample_fill_forward(df, step_s=60, agg="last").first()
        assert last["value"] == 6.0
        cnt = resample_fill_forward(df, step_s=60, agg="count").first()
        assert cnt["value"] == 2

    def test_validation(self, spark):
        import pytest as _pt

        from faisssearcher_spark.operators.events import resample_fill_forward
        df = spark.createDataFrame([(1, 0.0, 1.0)],
                                   "user_id long, ts double, value double")
        with _pt.raises(ValueError, match="positive"):
            resample_fill_forward(df, step_s=0)
        with _pt.raises(ValueError, match="agg must be"):
            resample_fill_forward(df, agg="median")
