"""Tests for operators/temporal.py (as-of join, range join) and
operators/dedup.py::dedup_clusters (connected components).

Known-answer fixtures small enough to verify by hand, plus structural
checks that the scalable plan shapes hold (no cartesian product in the
range join, single window scan in the as-of join).
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import dedup, temporal


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [(1, _ts(0), "t1"), (1, _ts(5), "t2"), (1, _ts(30), "t3"),
         (2, _ts(10), "t4"),
         (3, _ts(1), "t5")],
        "key long, ts timestamp, trade string")


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(4), 101.0), (1, _ts(5), 102.0),
         (2, _ts(20), 200.0),
         (4, _ts(0), 400.0)],
        "key long, ts timestamp, price double")


class TestAsofJoin:
    def test_basic_semantics(self, trades, quotes):
        out = temporal.asof_join(trades, quotes, on="key",
                                 right_cols=["price"]) \
            .select("trade", "right_price").collect()
        got = {r["trade"]: r["right_price"] for r in out}
        assert got == {
            "t1": 100.0,   # equal timestamp matches (inclusive)
            "t2": 102.0,   # equal-ts quote wins over the 10:04 one
            "t3": 102.0,   # latest at-or-before
            "t4": None,    # key 2's only quote is later
            "t5": None,    # key 3 has no quotes
        }

    def test_all_left_rows_kept(self, trades, quotes):
        assert temporal.asof_join(trades, quotes, on="key").count() \
            == trades.count()

    def test_forward_direction(self, trades, quotes):
        out = temporal.asof_join(trades, quotes, on="key",
                                 right_cols=["price"],
                                 direction="forward") \
            .select("trade", "right_price").collect()
        got = {r["trade"]: r["right_price"] for r in out}
        assert got == {
            "t1": 100.0,   # equal timestamp matches (inclusive)
            "t2": 102.0,   # equal-ts quote (10:05) is the earliest ≥
            "t3": None,    # no quote after 10:30 for key 1
            "t4": 200.0,   # key 2's 10:20 quote is ahead of 10:10
            "t5": None,    # key 3 has no quotes
        }

    def test_nearest_direction(self, trades, quotes):
        out = temporal.asof_join(trades, quotes, on="key",
                                 right_cols=["price"],
                                 direction="nearest") \
            .select("trade", "right_price").collect()
        got = {r["trade"]: r["right_price"] for r in out}
        assert got == {
            "t1": 100.0,   # exact
            "t2": 102.0,   # exact
            "t3": 102.0,   # only backward exists
            "t4": 200.0,   # only forward exists
            "t5": None,
        }

    def test_nearest_picks_closer_side_and_tolerance(self, spark):
        lefts = spark.createDataFrame(
            [(1, _ts(10), "a")], "key long, ts timestamp, tag string")
        rights = spark.createDataFrame(
            [(1, _ts(7), 1.0), (1, _ts(12), 2.0)],
            "key long, ts timestamp, price double")
        near = temporal.asof_join(lefts, rights, on="key",
                                  right_cols=["price"],
                                  direction="nearest").first()
        assert near["right_price"] == 2.0  # 2 min forward beats 3 min back
        gated = temporal.asof_join(lefts, rights, on="key",
                                   right_cols=["price"],
                                   direction="nearest",
                                   tolerance_seconds=150).first()
        assert gated["right_price"] == 2.0  # forward inside, backward out
        none = temporal.asof_join(lefts, rights, on="key",
                                  right_cols=["price"],
                                  direction="nearest",
                                  tolerance_seconds=60).first()
        assert none["right_price"] is None

    def test_bad_direction_raises(self, trades, quotes):
        with pytest.raises(ValueError, match="direction"):
            temporal.asof_join(trades, quotes, on="key", direction="upward")

    def test_tolerance_voids_stale(self, trades, quotes):
        out = temporal.asof_join(trades, quotes, on="key",
                                 right_cols=["price"],
                                 tolerance_seconds=600) \
            .select("trade", "right_price", "right_ts").collect()
        got = {r["trade"]: r["right_price"] for r in out}
        # t3 at 10:30 is 25 min after the last quote (10:05) -> voided
        assert got["t3"] is None
        assert got["t2"] == 102.0
        # the matched ts column is voided together with the payload
        ts_by_trade = {r["trade"]: r["right_ts"] for r in out}
        assert ts_by_trade["t3"] is None

    def test_tie_break_larger_wins(self, spark):
        left = spark.createDataFrame([(1, _ts(1), "L")],
                                     "key long, ts timestamp, tag string")
        right = spark.createDataFrame(
            [(1, _ts(0), 7, "a"), (1, _ts(0), 9, "b"), (1, _ts(0), 8, "c")],
            "key long, ts timestamp, event_id long, v string")
        out = temporal.asof_join(left, right, on="key",
                                 right_cols=["event_id", "v"],
                                 tie_break="event_id").collect()
        assert out[0]["right_v"] == "b" and out[0]["right_event_id"] == 9


class TestRangeJoin:
    def test_band_semantics(self, trades, quotes):
        out = temporal.range_join(
            trades.select("key", "ts", "trade"),
            quotes.select("key", "ts", "price"),
            on="key", lower_seconds=0.0, upper_seconds=300.0)
        pairs = {(r["l_trade"], r["r_price"]) for r in out.collect()}
        # quotes 0..5 min AFTER each trade
        assert pairs == {("t1", 100.0), ("t1", 101.0), ("t1", 102.0),
                         ("t2", 102.0)}

    def test_negative_band(self, trades, quotes):
        out = temporal.range_join(
            trades.select("key", "ts", "trade"),
            quotes.select("key", "ts", "price"),
            on="key", lower_seconds=-300.0, upper_seconds=0.0)
        pairs = {(r["l_trade"], r["r_price"]) for r in out.collect()}
        # quotes 0..5 min BEFORE each trade
        assert pairs == {("t1", 100.0), ("t2", 100.0), ("t2", 101.0),
                         ("t2", 102.0)}

    def test_no_cartesian_in_plan(self, trades, quotes):
        out = temporal.range_join(trades, quotes, on="key")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_invalid_band_raises(self, trades, quotes):
        with pytest.raises(ValueError):
            temporal.range_join(trades, quotes, on="key",
                                lower_seconds=10.0, upper_seconds=10.0)


class TestDedupClusters:
    # threshold=0 forces the distributed label-propagation loop; the
    # default exercises the driver union-find fast path.
    @pytest.mark.parametrize("thresh", [1_000_000, 0],
                             ids=["driver", "distributed"])
    def test_components(self, spark, thresh):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
            "id_a long, id_b long")
        out = {r["id"]: r["cluster_id"]
               for r in dedup.dedup_clusters(
                   pairs, driver_edge_threshold=thresh).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5,
                       8: 8, 9: 8, 10: 8}

    @pytest.mark.parametrize("thresh", [1_000_000, 0],
                             ids=["driver", "distributed"])
    def test_long_chain_converges(self, spark, thresh):
        n = 40  # one path graph: 0-1-2-...-39
        pairs = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                      "id_a long, id_b long")
        out = dedup.dedup_clusters(pairs, driver_edge_threshold=thresh)
        assert {r["cluster_id"] for r in out.collect()} == {0}
        assert out.count() == n + 1

    def test_empty_pairs(self, spark):
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert dedup.dedup_clusters(pairs).count() == 0


class TestAsofRandomized:
    """Differential test: asof_join vs pandas.merge_asof on randomized
    event sets — an independent reference implementation of the same
    semantics (backward search, inclusive, with tolerance)."""

    @pytest.mark.parametrize("seed", [7, 23, 99])
    def test_matches_pandas_merge_asof(self, spark, seed):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(seed)
        def mk(n):
            return pd.DataFrame({
                "key": rng.integers(0, 5, n),
                "ts": pd.to_datetime(
                    rng.integers(0, 100_000, n) * 1_000_000_000 + 1_600_000_000 * 10**9),
                "v": np.round(rng.standard_normal(n), 3),
            }).drop_duplicates(subset=["key", "ts"])
        left = mk(150).rename(columns={"v": "lv"})
        right = mk(150).rename(columns={"v": "rv"})

        expected = pd.merge_asof(
            left.sort_values("ts"), right.sort_values("ts"),
            on="ts", by="key", direction="backward",
            tolerance=pd.Timedelta(seconds=5000))

        got = temporal.asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="key", right_cols=["rv"], tolerance_seconds=5000,
        ).toPandas()

        e = expected.sort_values(["key", "ts"]).reset_index(drop=True)
        g = got.sort_values(["key", "ts"]).reset_index(drop=True)
        assert len(e) == len(g)
        assert (e["key"].tolist() == g["key"].tolist()
                and e["ts"].tolist() == g["ts"].tolist())
        er = e["rv"].fillna(float("nan")).tolist()
        gr = g["right_rv"].fillna(float("nan")).tolist()
        assert all((pd.isna(x) and pd.isna(y)) or x == y
                   for x, y in zip(er, gr))


class TestRangeRandomized:
    @pytest.mark.parametrize("seed", [3, 41])
    def test_matches_bruteforce(self, spark, seed):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(seed)
        def mk(n, tag):
            return pd.DataFrame({
                "key": rng.integers(0, 4, n),
                "ts": pd.to_datetime(
                    rng.integers(0, 50_000, n) * 1_000_000_000 + 1_600_000_000 * 10**9),
                tag: np.arange(n),
            })
        left, right = mk(80, "lid"), mk(80, "rid")

        lo, hi = -120.0, 300.0
        cross = left.merge(right, on="key", suffixes=("_l", "_r"))
        delta = (cross["ts_r"] - cross["ts_l"]).dt.total_seconds()
        expected = set(map(tuple, cross[(delta >= lo) & (delta <= hi)]
                           [["lid", "rid"]].itertuples(index=False, name=None)))

        got = temporal.range_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            on="key", lower_seconds=lo, upper_seconds=hi)
        got_pairs = set(map(tuple, got.select("l_lid", "r_rid").collect()))
        assert got_pairs == expected
