"""Stream-stream interval join (streaming/join.py): watermark-bounded
stateful pairing, checked against a batch twin on the same replayed
corpus, plus the outer-emission and validation contracts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.streaming.join import interval_join_streams

_T0 = dt.datetime(2024, 1, 2, 0, 0, 0)


def _write(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite") \
        .parquet(path)


def _stream(spark, path, schema):
    return spark.readStream.schema(schema).parquet(path)


@pytest.fixture(scope="module")
def sources(spark, tmp_path_factory):
    """Impressions (left) and clicks (right): click pairs iff same key
    and 0..300 s after the impression. Key 'c' clicks too late (400 s);
    key 'd' never clicks. A far-future flush row on both sides pushes
    the final watermark past every interval so outer results emit under
    the availableNow trigger."""
    tmp = tmp_path_factory.mktemp("ssj")
    imp_rows = [
        ("a", _T0),
        ("b", _T0 + dt.timedelta(seconds=60)),
        ("c", _T0 + dt.timedelta(seconds=120)),
        ("d", _T0 + dt.timedelta(seconds=180)),
        ("zzflush", _T0 + dt.timedelta(days=2)),
    ]
    clk_rows = [
        ("a", _T0 + dt.timedelta(seconds=30), 1.0),
        ("a", _T0 + dt.timedelta(seconds=290), 2.0),
        ("b", _T0 + dt.timedelta(seconds=61), 3.0),
        ("c", _T0 + dt.timedelta(seconds=520), 4.0),   # outside band
        ("zzflush", _T0 + dt.timedelta(days=2), 0.0),
    ]
    imp_p, clk_p = str(tmp / "imp"), str(tmp / "clk")
    _write(spark, imp_p, imp_rows, "key string, ts timestamp")
    _write(spark, clk_p, clk_rows, "key string, ts timestamp, v double")
    return imp_p, clk_p


def _drain(spark, df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


class TestInner:
    def test_matches_batch_twin(self, spark, sources):
        imp_p, clk_p = sources
        out = interval_join_streams(
            _stream(spark, imp_p, "key string, ts timestamp"),
            _stream(spark, clk_p, "key string, ts timestamp, v double"),
            key="key", lower="0 seconds", upper="5 minutes",
            left_watermark="10 minutes", right_watermark="10 minutes")
        got = sorted((r["key"], r["v"]) for r in
                     _drain(spark, out, "ssj_inner")
                     .filter(F.col("key") != "zzflush").collect())
        # batch twin: plain join with the same band predicate
        imp = spark.read.parquet(imp_p)
        clk = spark.read.parquet(clk_p).withColumnRenamed("ts", "ts_r")
        exp = sorted(
            (r["key"], r["v"]) for r in imp.join(clk, "key")
            .filter((F.col("ts_r") >= F.col("ts"))
                    & (F.col("ts_r") <= F.col("ts")
                       + F.expr("INTERVAL 5 minutes")))
            .filter(F.col("key") != "zzflush").collect())
        assert got == exp
        assert got == [("a", 1.0), ("a", 2.0), ("b", 3.0)]


class TestOuter:
    def test_left_outer_emits_unmatched_after_watermark(self, spark,
                                                        sources):
        imp_p, clk_p = sources
        out = interval_join_streams(
            _stream(spark, imp_p, "key string, ts timestamp"),
            _stream(spark, clk_p, "key string, ts timestamp, v double"),
            key="key", lower="0 seconds", upper="5 minutes",
            left_watermark="10 minutes", right_watermark="10 minutes",
            how="leftOuter")
        rows = _drain(spark, out, "ssj_louter") \
            .filter(F.col("key") != "zzflush").collect()
        by_key = {}
        for r in rows:
            by_key.setdefault(r["key"], []).append(r["v"])
        assert sorted(by_key["a"]) == [1.0, 2.0]
        assert by_key["b"] == [3.0]
        # c's click fell outside the band, d never clicked: both emit
        # exactly once with a null right side once the watermark passed
        assert by_key["c"] == [None]
        assert by_key["d"] == [None]


class TestValidation:
    def test_rejects_batch_inputs(self, spark, sources):
        imp_p, _ = sources
        batch = spark.read.parquet(imp_p)
        with pytest.raises(ValueError, match="streaming"):
            interval_join_streams(batch, batch, key="key")

    def test_rejects_unknown_how(self, spark, sources):
        imp_p, clk_p = sources
        with pytest.raises(ValueError, match="how must be"):
            interval_join_streams(
                _stream(spark, imp_p, "key string, ts timestamp"),
                _stream(spark, clk_p, "key string, ts timestamp, v double"),
                key="key", how="anti")

    def test_collision_columns_suffixed(self, spark, sources):
        imp_p, clk_p = sources
        out = interval_join_streams(
            _stream(spark, imp_p, "key string, ts timestamp"),
            _stream(spark, clk_p, "key string, ts timestamp, v double"),
            key="key")
        assert set(out.columns) == {"key", "ts", "ts_r", "v"}
