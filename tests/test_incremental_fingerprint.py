"""Incremental Hamming-fingerprint near-dup store
(operators/incremental.py FingerprintStore — the third store,
completing the matrix: MinHash/text, Embedding/vectors, this one for
simhash/image/audio/video prints) + the streaming sink."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.incremental import FingerprintStore


def _fps(spark, rows):
    return spark.createDataFrame(rows, "id long, fp long")


@pytest.fixture(scope="module")
def planted(spark):
    """History 0..49: random-ish 64-bit prints. Batch: 10 fresh prints
    (ids 100+, random) + 5 near-copies of history (ids 1000+i: history
    print i with exactly 2 bits flipped — inside h=3)."""
    import random

    rng = random.Random(42)
    hist = [(i, rng.getrandbits(63)) for i in range(50)]
    fresh = [(100 + i, rng.getrandbits(63)) for i in range(10)]
    near = [(1000 + i, hist[i][1] ^ (1 << (i + 3)) ^ (1 << (i + 20)))
            for i in range(5)]
    return hist, fresh + near


class TestFingerprintStore:
    def test_screen_finds_planted_near_copies(self, spark, planted,
                                              tmp_path):
        hist, batch = planted
        st = FingerprintStore(spark, str(tmp_path / "s"), bits=64,
                              max_hamming=3)
        st.commit(_fps(spark, hist))
        hits = st.screen(_fps(spark, batch)).collect()
        got = {(r["new_id"], r["known_id"], r["hamming"]) for r in hits}
        assert got == {(1000 + i, i, 2) for i in range(5)}

    def test_stricter_screen_ok_looser_refused(self, spark, planted,
                                               tmp_path):
        hist, batch = planted
        st = FingerprintStore(spark, str(tmp_path / "s"), bits=64,
                              max_hamming=3)
        st.commit(_fps(spark, hist))
        # h=1 excludes the 2-bit-flip plants (band guarantee still holds)
        assert st.screen(_fps(spark, batch), max_hamming=1).count() == 0
        with pytest.raises(ValueError, match="banding guarantee"):
            st.screen(_fps(spark, batch), max_hamming=4)

    def test_filter_new_and_accumulation(self, spark, planted, tmp_path):
        hist, batch = planted
        st = FingerprintStore(spark, str(tmp_path / "s"), bits=64,
                              max_hamming=3)
        st.commit(_fps(spark, hist[:25]))
        st.commit(_fps(spark, hist[25:]))
        kept = st.filter_new(_fps(spark, batch))
        assert {r["id"] for r in kept.collect()} \
            == {100 + i for i in range(10)}

    def test_empty_store_and_identity_validation(self, spark, planted,
                                                 tmp_path):
        hist, batch = planted
        st = FingerprintStore(spark, str(tmp_path / "s"), bits=64,
                              max_hamming=3)
        out = st.screen(_fps(spark, batch))
        assert out.columns == ["new_id", "known_id", "hamming"]
        assert out.count() == 0
        st.commit(_fps(spark, hist))
        with pytest.raises(ValueError, match="original parameters"):
            FingerprintStore(spark, str(tmp_path / "s"), bits=64,
                             max_hamming=2)
        with pytest.raises(ValueError, match="bits"):
            FingerprintStore(spark, str(tmp_path / "x"), bits=65)
        with pytest.raises(ValueError, match="max_hamming"):
            FingerprintStore(spark, str(tmp_path / "x"), bits=8,
                             max_hamming=8)

    def test_file_uri_path_still_validates_identity(self, spark,
                                                    planted, tmp_path):
        """A file:-scheme store path must strip to a local filesystem
        path before pyarrow/os.path touch the meta — the raw URI made
        every existence check False, silently skipping the parameter-
        identity validation (review catch)."""
        hist, _ = planted
        uri = f"file:{tmp_path / 's'}"
        st = FingerprintStore(spark, uri, bits=64, max_hamming=3)
        st.commit(_fps(spark, hist[:5]))
        with pytest.raises(ValueError, match="original parameters"):
            FingerprintStore(spark, uri, bits=64, max_hamming=2)

    def test_negative_screen_radius_refused(self, spark, planted,
                                            tmp_path):
        hist, batch = planted
        st = FingerprintStore(spark, str(tmp_path / "s"), bits=64,
                              max_hamming=3)
        st.commit(_fps(spark, hist))
        with pytest.raises(ValueError, match=">= 0"):
            st.screen(_fps(spark, batch), max_hamming=-1)

    def test_bucketed_mode_matches_path_mode_without_state_shuffle(
            self, spark, planted, tmp_path):
        hist, batch = planted
        plain = FingerprintStore(spark, str(tmp_path / "p"), bits=64,
                                 max_hamming=3)
        plain.commit(_fps(spark, hist))
        bucketed = FingerprintStore(spark, str(tmp_path / "b"), bits=64,
                                    max_hamming=3,
                                    bucketed_table="t_fpstore_test",
                                    n_buckets=8)
        try:
            bucketed.commit(_fps(spark, hist))
            a = sorted(map(tuple,
                           plain.screen(_fps(spark, batch)).collect()))
            b = sorted(map(tuple,
                           bucketed.screen(_fps(spark, batch)).collect()))
            assert a == b and a
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                plan = bucketed.screen(_fps(spark, batch))._jdf \
                    .queryExecution().executedPlan().toString()
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                               old)
            assert "Bucketed: true" in plan
            scan_at = plan.index(
                "FileScan parquet spark_catalog.default.t_fpstore_test")
            join_at = plan.rindex("SortMergeJoin", 0, scan_at)
            seg = plan[join_at:scan_at].splitlines()[1:]
            state_branch = [l for l in seg
                            if not l.lstrip().startswith(":")]
            assert not any("Exchange" in l for l in state_branch)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_fpstore_test")


class TestFingerprintScreenSink:
    def test_streaming_matches_batch_prefix(self, spark, planted,
                                            tmp_path):
        """Replay history + batch as two mtime-ordered micro-batches;
        survivors must equal the batch store's filter_new over the same
        prefix, and a planted in-batch near-pair keeps min id."""
        import time

        from faisssearcher_spark.streaming.incremental import \
            fingerprint_screen_sink

        hist, batch = planted
        # plant one in-batch near-pair: 2000/2001 differ in 1 bit
        extra = [(2000, 1 << 40 | 7), (2001, 1 << 40 | 6)]
        src = str(tmp_path / "src")
        for rows in (hist, batch + extra):
            _fps(spark, rows).coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = (spark.readStream.schema("id long, fp long")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = fingerprint_screen_sink(
            stream, store_dir=str(tmp_path / "st"),
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            bits=64, max_hamming=3)
        q.awaitTermination()
        got = {r["id"] for r in
               spark.read.parquet(str(tmp_path / "out")).collect()}
        want = ({i for i, _ in hist}            # epoch 0: all new
                | {100 + i for i in range(10)}  # fresh survive
                | {2000})                       # in-batch pair: min id
        assert got == want


class TestSinkMetaGuard:
    def test_resume_under_changed_params_refused(self, spark, tmp_path):
        """Batch 0 stamps the parameter marker; a later batch under
        DIFFERENT parameters (a checkpoint resume after an arg change)
        must fail loudly — mixed band/signature plans silently stop
        screening. A fresh batch 0 restamps (epochs are truncated
        there anyway), so legitimate reconfiguration works."""
        from faisssearcher_spark.streaming.incremental import \
            _guard_sink_meta

        d = str(tmp_path / "store")
        a = {"bits": 64, "max_hamming": 3}
        b = {"bits": 32, "max_hamming": 3}
        _guard_sink_meta(spark, d, a, batch_id=0)
        _guard_sink_meta(spark, d, a, batch_id=3)       # same: ok
        with pytest.raises(ValueError, match="different"):
            _guard_sink_meta(spark, d, b, batch_id=3)   # resume mismatch
        _guard_sink_meta(spark, d, b, batch_id=0)       # fresh restamp
        _guard_sink_meta(spark, d, b, batch_id=1)
        with pytest.raises(ValueError, match="different"):
            _guard_sink_meta(spark, d, a, batch_id=1)
