"""Corpus snapshot diffing (operators/diffing.py) and time-decay
features (operators/temporal.decayed_sum / rolling_window_agg)."""

import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import temporal
from faisssearcher_spark.operators.diffing import corpus_diff, diff_summary


class TestCorpusDiff:
    @pytest.fixture(scope="class")
    def snapshots(self, spark):
        old = spark.createDataFrame(
            [(1, "alpha"), (2, "bravo"), (3, "charlie")],
            "doc_id long, text string")
        new = spark.createDataFrame(
            [(2, "bravo"), (3, "charlie EDITED"), (4, "delta")],
            "doc_id long, text string")
        return old, new

    def test_statuses(self, snapshots):
        old, new = snapshots
        got = {r["key"]: r["status"]
               for r in corpus_diff(old, new).collect()}
        assert got == {1: "removed", 2: "unchanged", 3: "changed",
                       4: "added"}

    def test_summary_counts(self, snapshots):
        old, new = snapshots
        s = {r["status"]: r["n"]
             for r in diff_summary(corpus_diff(old, new)).collect()}
        assert s == {"added": 1, "removed": 1, "changed": 1,
                     "unchanged": 1}

    def test_duplicate_keys_rejected_lazily(self, spark, snapshots):
        """The guard is part of the plan (no eager jobs at build time):
        building the frame succeeds, executing it raises."""
        _, new = snapshots
        dup = spark.createDataFrame([(1, "a"), (1, "b")],
                                    "doc_id long, text string")
        diff = corpus_diff(dup, new)     # must not launch any job
        with pytest.raises(Exception, match="duplicate"):
            diff.collect()

    def test_null_precomputed_fingerprint_both_sides(self, spark):
        """A NULL fingerprint means 'present with null content' — the
        key never left, so both-null must be unchanged, null→value
        changed (not added)."""
        old = spark.createDataFrame([(1, None), (2, None)],
                                    "doc_id long, fp string")
        new = spark.createDataFrame([(1, None), (2, "now set")],
                                    "doc_id long, fp string")
        got = {r["key"]: r["status"] for r in
               corpus_diff(old, new, fingerprint_col="fp").collect()}
        assert got == {1: "unchanged", 2: "changed"}

    def test_precomputed_fingerprint_column(self, spark):
        """Whitespace-insensitive diff via a normalized fingerprint."""
        from faisssearcher_spark.functions.text import (fingerprint,
                                                        normalize_text)
        old = spark.createDataFrame([(1, "Hello,  World!")],
                                    "doc_id long, text string") \
            .withColumn("fp", F.md5(normalize_text("text")))
        new = spark.createDataFrame([(1, "hello world")],
                                    "doc_id long, text string") \
            .withColumn("fp", F.md5(normalize_text("text")))
        out = corpus_diff(old, new, fingerprint_col="fp").collect()
        assert out[0]["status"] == "unchanged"

    def test_null_text_diffs_cleanly(self, spark):
        old = spark.createDataFrame([(1, None)], "doc_id long, text string")
        new = spark.createDataFrame([(1, "now set")],
                                    "doc_id long, text string")
        assert corpus_diff(old, new).first()["status"] == "changed"


class TestDecayedSum:
    def _events(self, spark):
        # one user, events at t = 0, 10, 30 s with values 1, 2, 4
        rows = [(7, 0.0, 1.0), (7, 10.0, 2.0), (7, 30.0, 4.0),
                (8, 5.0, 10.0)]
        return spark.createDataFrame(rows, "uid long, ts double, v double")

    def test_matches_python_reference(self, spark):
        hl = 10.0
        out = temporal.decayed_sum(
            self._events(spark), key_col="uid", ts_col="ts", value_col="v",
            half_life_s=hl).orderBy("uid", "ts").collect()
        events = [(0.0, 1.0), (10.0, 2.0), (30.0, 4.0)]
        for row, (ti, _) in zip(out[:3], events):
            want = sum(v * 2 ** (-(ti - tj) / hl)
                       for tj, v in events if tj <= ti)
            assert row["decayed_sum"] == pytest.approx(want, rel=1e-12)
        assert out[3]["decayed_sum"] == pytest.approx(10.0)

    def test_overflow_guard_raises(self, spark):
        rows = [(1, 0.0, 1.0), (1, 1e9, 1.0)]   # 1e9 s span, 1 s half-life
        df = spark.createDataFrame(rows, "uid long, ts double, v double")
        with pytest.raises(Exception, match="half-lives"):
            temporal.decayed_sum(df, key_col="uid", ts_col="ts",
                                 value_col="v", half_life_s=1.0).collect()

    def test_half_life_validation(self, spark):
        with pytest.raises(ValueError, match="positive"):
            temporal.decayed_sum(self._events(spark), key_col="uid",
                                 ts_col="ts", value_col="v",
                                 half_life_s=0)


class TestRollingWindowAgg:
    def test_matches_python_reference(self, spark):
        rows = [(1, 0.0, 1.0), (1, 50.0, 2.0), (1, 110.0, 3.0),
                (1, 115.0, 4.0), (2, 0.0, 9.0)]
        df = spark.createDataFrame(rows, "uid long, ts double, v double")
        out = temporal.rolling_window_agg(
            df, key_col="uid", ts_col="ts", value_col="v", window_s=60,
            aggs=("count", "sum", "max")).orderBy("uid", "ts").collect()
        # trailing 60 s inclusive: {0}, {0,50}, {50,110}, {110,115}, {0}
        want = [(1, 1.0), (2, 3.0), (2, 5.0), (2, 7.0), (1, 9.0)]
        for row, (n, s) in zip(out, want):
            assert row["rolling_count"] == n
            assert row["rolling_sum"] == pytest.approx(s)
        assert out[3]["rolling_max"] == 4.0

    def test_unsupported_agg(self, spark):
        df = spark.createDataFrame([(1, 0.0, 1.0)],
                                   "uid long, ts double, v double")
        with pytest.raises(ValueError, match="unsupported"):
            temporal.rolling_window_agg(df, key_col="uid", ts_col="ts",
                                        value_col="v", window_s=10,
                                        aggs=("median",))


class TestDriftReport:
    def test_identical_distributions_near_zero(self, spark):
        from faisssearcher_spark.operators.diffing import drift_report
        import numpy as np
        rng = np.random.default_rng(0)
        vals = rng.normal(50, 10, 4000)
        old = spark.createDataFrame([(float(v),) for v in vals[:2000]],
                                    "x double")
        new = spark.createDataFrame([(float(v),) for v in vals[2000:]],
                                    "x double")
        r = drift_report(old, new, ["x"]).first()
        assert r["psi"] < 0.05
        assert r["n_old"] == 2000 and r["n_new"] == 2000

    def test_shifted_distribution_flags(self, spark):
        from faisssearcher_spark.operators.diffing import drift_report
        import numpy as np
        rng = np.random.default_rng(1)
        old = spark.createDataFrame(
            [(float(v),) for v in rng.normal(50, 10, 2000)], "x double")
        new = spark.createDataFrame(
            [(float(v),) for v in rng.normal(70, 10, 2000)], "x double")
        r = drift_report(old, new, ["x"]).first()
        assert r["psi"] > 0.25      # a two-sigma mean shift is major drift

    def test_nulls_excluded_and_validation(self, spark):
        from faisssearcher_spark.operators.diffing import drift_report
        import pytest as _pt
        old = spark.createDataFrame([(1.0,), (2.0,), (None,)], "x double")
        new = spark.createDataFrame([(1.0,), (None,), (None,)], "x double")
        r = drift_report(old, new, ["x"], buckets=2).first()
        assert (r["n_old"], r["n_new"]) == (2, 1)
        with _pt.raises(ValueError, match="non-empty"):
            drift_report(old, new, [])
        with _pt.raises(ValueError, match=">= 2"):
            drift_report(old, new, ["x"], buckets=1)
