"""Mergeable sketch summaries (operators/sketches.py): HLL distinct-count
rollups, the relational count-min sketch, bounded-shuffle heavy hitters."""

import hashlib

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import sketches
from faisssearcher_spark.sources.catalog import load_table


def _py_bucket(value: str, row_idx: int, width: int, salt: str = "cms") -> int:
    """Python replica of the md5 bucket arithmetic (the DuckDB twin)."""
    s = f"{salt}|{row_idx}|{value}"
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % width


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


class TestHll:
    def test_estimate_within_5pct_of_exact(self, events):
        exact = {r["event_type"]: r["n"] for r in
                 events.groupBy("event_type")
                 .agg(F.countDistinct("user_id").alias("n")).collect()}
        sk = sketches.hll_sketches(events, ["event_type"], "user_id")
        est = {r["event_type"]: r["n_distinct_approx"]
               for r in sketches.hll_rollup(sk, ["event_type"]).collect()}
        for et, n in exact.items():
            assert abs(est[et] - n) <= 0.05 * n

    def test_fine_grain_sketches_roll_up(self, events):
        """The load-bearing property: per-day sketches stored once serve
        the per-type rollup by UNION, close to the whole-pass sketch."""
        daily = sketches.hll_sketches(
            events.withColumn("day", F.to_date("ts")),
            ["event_type", "day"], "user_id")
        rolled = {r["event_type"]: r["n_distinct_approx"]
                  for r in sketches.hll_rollup(daily, ["event_type"]).collect()}
        whole = {r["event_type"]: r["n_distinct_approx"]
                 for r in sketches.hll_rollup(
                     sketches.hll_sketches(events, ["event_type"], "user_id"),
                     ["event_type"]).collect()}
        for et in whole:
            assert rolled[et] == pytest.approx(whole[et], rel=0.02)

    def test_empty_group_cols_rejected(self, events):
        with pytest.raises(ValueError, match="non-empty"):
            sketches.hll_sketches(events, [], "user_id")
        with pytest.raises(ValueError, match="non-empty"):
            sketches.hll_rollup(events, [])


class TestCms:
    WIDTH, DEPTH = 4096, 4

    @pytest.fixture(scope="class")
    def words(self, spark):
        rows = [("alpha",)] * 50 + [("beta",)] * 20 + [("gamma",)] * 5 \
            + [(f"tail{i}",) for i in range(40)]
        return spark.createDataFrame(rows, "w string")

    def test_cell_table_bounded_and_matches_python(self, words):
        cms = sketches.cms_table(words, "w", depth=self.DEPTH,
                                 width=self.WIDTH)
        cells = cms.collect()
        assert len(cells) <= self.DEPTH * self.WIDTH
        assert {r["row_idx"] for r in cells} == set(range(self.DEPTH))
        # every cell's bucket must equal the Python/DuckDB hash replica
        counts = {"alpha": 50, "beta": 20, "gamma": 5}
        counts.update({f"tail{i}": 1 for i in range(40)})
        want = {}
        for w, n in counts.items():
            for i in range(self.DEPTH):
                key = (i, _py_bucket(w, i, self.WIDTH))
                want[key] = want.get(key, 0) + n
        got = {(r["row_idx"], r["bucket"]): r["cnt"] for r in cells}
        assert got == want

    def test_lookup_one_sided_error(self, spark, words):
        cms = sketches.cms_table(words, "w", depth=self.DEPTH,
                                 width=self.WIDTH)
        items = spark.createDataFrame(
            [("alpha", 50), ("beta", 20), ("gamma", 5), ("absent", 0)],
            "w string, true_cnt int")
        out = {r["w"]: r["cms_est"] for r in sketches.cms_lookup(
            cms, items, "w", depth=self.DEPTH, width=self.WIDTH).collect()}
        truth = {"alpha": 50, "beta": 20, "gamma": 5, "absent": 0}
        for w, n in truth.items():
            assert out[w] >= n          # CMS never undercounts
        # width >> distinct keys: no collisions, estimates are exact
        assert out == truth

    def test_null_keys_never_sketched_and_lookup_null(self, spark):
        """NULL values are excluded from the sketch (they'd hash like ''
        through concat_ws while the DuckDB '||' twin propagates NULL —
        r5 ADVICE), and looking up a NULL key returns NULL, not a
        phantom estimate."""
        rows = [("alpha",)] * 3 + [(None,)] * 5 + [("",)] * 2
        df = spark.createDataFrame(rows, "w string")
        cms = sketches.cms_table(df, "w", depth=2, width=64)
        total = sum(r["cnt"] for r in cms.collect())
        assert total == 2 * 5          # depth × non-null rows; nulls out
        items = spark.createDataFrame(
            [("alpha",), (None,), ("",)], "w string")
        out = {r["w"]: r["cms_est"] for r in sketches.cms_lookup(
            cms, items, "w", depth=2, width=64).collect()}
        assert out["alpha"] >= 3 and out[""] >= 2
        assert out[None] is None

    def test_lookup_params_must_match_salt(self, spark, words):
        cms = sketches.cms_table(words, "w", depth=2, width=64, salt="a")
        items = spark.createDataFrame([("alpha",)], "w string")
        out = sketches.cms_lookup(cms, items, "w", depth=2, width=64,
                                  salt="b").collect()
        # wrong salt hashes to (mostly) empty cells -> min underestimates;
        # the API contract is "params must match", this just pins that a
        # mismatch is observable rather than silently correct
        assert out[0]["cms_est"] <= 50

    def test_reserved_column_collision(self, spark, words):
        cms = sketches.cms_table(words, "w")
        bad = spark.createDataFrame([("x", 1)], "w string, cms_est int")
        with pytest.raises(ValueError, match="cms_est"):
            sketches.cms_lookup(cms, bad, "w")


class TestHeavyHitters:
    @pytest.fixture(scope="class")
    def zipf(self, spark):
        rows = []
        for rank in range(1, 40):
            rows += [(f"w{rank}",)] * (2000 // rank)
        return spark.createDataFrame(rows, "tok string").repartition(8)

    def test_matches_exact_topk(self, zipf):
        fast = sketches.heavy_hitters(zipf, "tok", k=10).collect()
        exact = sketches.heavy_hitters(zipf, "tok", k=10,
                                       exact=True).collect()
        assert [(r["item"], r["freq"]) for r in fast] \
            == [(r["item"], r["freq"]) for r in exact]

    def test_counts_are_exact_for_returned_items(self, zipf):
        out = {r["item"]: r["freq"]
               for r in sketches.heavy_hitters(zipf, "tok", k=5).collect()}
        for rank in range(1, 6):
            assert out[f"w{rank}"] == 2000 // rank

    def test_non_string_column_casts(self, spark):
        df = spark.createDataFrame([(1,)] * 9 + [(2,)] * 3, "v int")
        out = sketches.heavy_hitters(df, "v", k=1).collect()
        assert (out[0]["item"], out[0]["freq"]) == ("1", 9)


class TestReviewRegressions:
    def test_heavy_hitters_null_semantics_agree(self, spark):
        """NULLs are excluded on BOTH paths (review finding: exact
        groupBy kept the null group while the fast path dropped it)."""
        rows = [(None,)] * 9 + [("a",)] * 3 + [("b",)]
        df = spark.createDataFrame(rows, "v string")
        fast = sketches.heavy_hitters(df, "v", k=1).collect()
        exact = sketches.heavy_hitters(df, "v", k=1, exact=True).collect()
        assert [(r["item"], r["freq"]) for r in fast] \
            == [(r["item"], r["freq"]) for r in exact] == [("a", 3)]

    def test_cms_probe_column_reserved(self, spark):
        cms = sketches.cms_table(
            spark.createDataFrame([("x",)], "w string"), "w")
        bad = spark.createDataFrame([("x", 1)],
                                    "w string, __cms_probe int")
        with pytest.raises(ValueError, match="__cms_probe"):
            sketches.cms_lookup(cms, bad, "w")
