"""Incrementally-maintained HLL sketch state (streaming/sketches.py)."""

import shutil

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import sketches
from faisssearcher_spark.sources.catalog import load_table
from faisssearcher_spark.streaming import events as sev
from faisssearcher_spark.streaming.sketches import (hll_sketch_sink,
                                                    read_sketch_state)


@pytest.fixture(scope="module")
def multi_file_events(spark, sf_dir, tmp_path_factory):
    """Events re-landed as 4 files so maxFilesPerTrigger=1 yields 4
    micro-batches."""
    path = str(tmp_path_factory.mktemp("ev_src") / "events")
    load_table(spark, sf_dir, "events").repartition(4) \
        .write.mode("overwrite").parquet(path)
    return path


def _run(spark, src, state, ckpt):
    stream = sev.read_events_stream(spark, src, max_files_per_trigger=1)
    q = hll_sketch_sink(stream, group_cols=["event_type"],
                        value_col="user_id", state_dir=state,
                        checkpoint_dir=ckpt)
    q.awaitTermination()


class TestHllSketchSink:
    def test_incremental_state_matches_batch(self, spark, sf_dir,
                                             multi_file_events,
                                             tmp_path_factory):
        base = tmp_path_factory.mktemp("hll_state")
        state, ckpt = str(base / "state"), str(base / "ckpt")
        _run(spark, multi_file_events, state, ckpt)

        import os
        epochs = [d for d in os.listdir(state) if d.startswith("epoch=")]
        assert len(epochs) >= 2      # genuinely incremental

        est = {r["event_type"]: r["n_distinct_approx"] for r in
               sketches.hll_rollup(read_sketch_state(spark, state),
                                   ["event_type"]).collect()}
        exact = {r["event_type"]: r["n"] for r in
                 load_table(spark, sf_dir, "events").groupBy("event_type")
                 .agg(F.countDistinct("user_id").alias("n")).collect()}
        assert set(est) == set(exact)
        for et, n in exact.items():
            assert abs(est[et] - n) <= 0.05 * n

    def test_replay_converges(self, spark, multi_file_events,
                              tmp_path_factory):
        base = tmp_path_factory.mktemp("hll_replay")
        state, ckpt = str(base / "state"), str(base / "ckpt")
        _run(spark, multi_file_events, state, ckpt)
        first = {r["event_type"]: r["n_distinct_approx"] for r in
                 sketches.hll_rollup(read_sketch_state(spark, state),
                                     ["event_type"]).collect()}
        shutil.rmtree(ckpt)          # total offset loss -> full replay
        _run(spark, multi_file_events, state, ckpt)
        replay = {r["event_type"]: r["n_distinct_approx"] for r in
                  sketches.hll_rollup(read_sketch_state(spark, state),
                                      ["event_type"]).collect()}
        assert replay == first       # byte-identical state recomputation

    def test_missing_state_raises(self, spark, tmp_path_factory):
        with pytest.raises(FileNotFoundError, match="no sketch state"):
            read_sketch_state(
                spark, str(tmp_path_factory.mktemp("empty") / "nope"))

    def test_group_cols_required(self, spark, multi_file_events):
        stream = sev.read_events_stream(spark, multi_file_events)
        with pytest.raises(ValueError, match="non-empty"):
            hll_sketch_sink(stream, group_cols=[], value_col="user_id",
                            state_dir="/tmp/x", checkpoint_dir="/tmp/y")


class TestStaleStateTruncation:
    def test_reset_checkpoint_truncates_old_epochs(self, spark,
                                                   multi_file_events,
                                                   tmp_path_factory):
        """A reset checkpoint re-delivers everything as new epochs; stale
        higher-numbered epoch dirs from the previous run must not
        survive to be returned by read_sketch_state (review finding)."""
        import os
        import shutil

        base = tmp_path_factory.mktemp("hll_stale")
        state, ckpt = str(base / "state"), str(base / "ckpt")
        _run(spark, multi_file_events, state, ckpt)   # epochs 0..3
        assert len([d for d in os.listdir(state)
                    if d.startswith("epoch=")]) >= 2
        shutil.rmtree(ckpt)
        # re-run WITHOUT a trigger cap: everything arrives as batch 0
        stream = sev.read_events_stream(spark, multi_file_events)
        q = hll_sketch_sink(stream, group_cols=["event_type"],
                            value_col="user_id", state_dir=state,
                            checkpoint_dir=ckpt)
        q.awaitTermination()
        epochs = [d for d in os.listdir(state) if d.startswith("epoch=")]
        assert epochs == ["epoch=0"]    # stale 1..3 truncated
        est = {r["event_type"]: r["n_distinct_approx"] for r in
               sketches.hll_rollup(read_sketch_state(spark, state),
                                   ["event_type"]).collect()}
        assert len(est) == 5 and all(v > 0 for v in est.values())


class TestCmsSketchSink:
    def _run_cms(self, spark, src, state, ckpt):
        from faisssearcher_spark.streaming.sketches import cms_sketch_sink

        stream = sev.read_events_stream(spark, src,
                                        max_files_per_trigger=1)
        cms_sketch_sink(stream, value_col="event_type",
                        state_dir=state, checkpoint_dir=ckpt,
                        depth=4, width=64).awaitTermination()

    def test_streamed_cells_equal_batch_sketch(self, spark, sf_dir,
                                               multi_file_events,
                                               tmp_path_factory):
        """Cell additivity: the multi-epoch streamed state must be
        row-identical to one batch cms_table over all events —
        regardless of batching, the stream≡batch parity the gate leg
        hashes."""
        import os

        base = tmp_path_factory.mktemp("cms_state")
        state, ckpt = str(base / "state"), str(base / "ckpt")
        self._run_cms(spark, multi_file_events, state, ckpt)
        epochs = [d for d in os.listdir(state) if d.startswith("epoch=")]
        assert len(epochs) >= 2      # genuinely incremental
        streamed = sorted(map(tuple,
                              read_sketch_state(spark, state).collect()))
        batch = sorted(map(tuple, sketches.cms_table(
            load_table(spark, sf_dir, "events"), "event_type",
            depth=4, width=64).collect()))
        assert streamed == batch and batch

    def test_replay_converges(self, spark, multi_file_events,
                              tmp_path_factory):
        """Same input through two fresh checkpoints -> identical final
        state (epoch overwrite + batch-0 truncation, the hll sink's
        replay discipline)."""
        base = tmp_path_factory.mktemp("cms_replay")
        s1, c1 = str(base / "s1"), str(base / "c1")
        self._run_cms(spark, multi_file_events, s1, c1)
        first = sorted(map(tuple, read_sketch_state(spark, s1).collect()))
        shutil.rmtree(c1)
        self._run_cms(spark, multi_file_events, s1, c1)
        second = sorted(map(tuple,
                            read_sketch_state(spark, s1).collect()))
        assert first == second


class TestPriorStateSchemaGuard:
    def test_incompatible_prior_state_raises(self, spark, sf_dir,
                                             tmp_path_factory):
        """r13 ADVICE: the schema-on-read fast path must verify (once
        per stream) that the prior epoch's footer actually carries the
        sketch columns — state from an incompatible older layout must
        fail loudly, not be silently misread as nulls."""
        import os

        base = tmp_path_factory.mktemp("hll_bad_state")
        src = str(base / "src")
        ev = load_table(spark, sf_dir, "events")
        ev.repartition(2).write.mode("overwrite").parquet(src)
        state, ckpt = str(base / "state"), str(base / "ckpt")
        _run(spark, src, state, ckpt)

        epochs = sorted(int(d.split("=")[1]) for d in os.listdir(state)
                        if d.startswith("epoch="))
        assert len(epochs) >= 2
        # simulate an older library version's state: rename every column
        last = f"{state}/epoch={epochs[-1]}"
        old = spark.read.parquet(last)
        renamed = old.select([F.col(c).alias(c + "_v0")
                              for c in old.columns])
        tmp_dir = str(base / "tmp_epoch")
        renamed.write.mode("overwrite").parquet(tmp_dir)
        shutil.rmtree(last)
        shutil.move(tmp_dir, last)
        # one more source file -> one more micro-batch on the same ckpt
        ev.limit(5).coalesce(1).write.mode("append").parquet(src)
        with pytest.raises(Exception, match="incompatible sketch schema"):
            _run(spark, src, state, ckpt)
