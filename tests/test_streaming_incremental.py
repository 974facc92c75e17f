"""Streaming near-dup screen (streaming/incremental.py): epoch-state
replay safety, cross-batch screening, in-batch dedup, agreement with
the batch MinHashStore over the same prefix."""

import shutil

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.streaming.incremental import minhash_screen_sink

_BASE = ("the quick brown fox jumps over the lazy dog near the river "
         "bank at dawn while birds sing softly and the cold morning "
         "mist drifts slowly across the quiet water meadow toward the "
         "old stone bridge")


@pytest.fixture(scope="module")
def doc_files(spark, tmp_path_factory):
    """3 parquet files → 3 micro-batches at maxFilesPerTrigger=1:
    file order by doc_id batches (0-1), (10-12), (20-21)."""
    near = _BASE.replace("dawn", "dusk")
    batches = [
        [(0, _BASE), (1, "spark query engines shuffle hash partitions "
                         "across executors with adaptive planning")],
        [(10, near),                       # near-dup of committed 0
         (11, "fresh text about columnar io and vectorized parquet "
              "readers in modern analytical engines"),
         (12, "fresh text about columnar io and vectorized parquet "
              "readers in modern analytical engines today")],  # in-batch
        [(20, _BASE),                      # exact dup of committed 0
         (21, "completely novel final document with vocabulary shared "
              "by nothing else in this stream at all")],
    ]
    import time

    path = str(tmp_path_factory.mktemp("docs_src") / "docs")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)   # FileStreamSource orders by mtime; coarse-
        #                   granularity filesystems need distinct seconds
    return path


def _run(spark, src, base):
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = minhash_screen_sink(
        stream, store_dir=str(base / "store"), out_dir=str(base / "out"),
        checkpoint_dir=str(base / "ckpt"), threshold=0.5,
        num_hashes=16, bands=8, shingle_n=3)
    q.awaitTermination()
    return {r["doc_id"] for r in
            spark.read.parquet(str(base / "out")).collect()}


class TestMinhashScreenSink:
    def test_screens_history_and_within_batch(self, spark, doc_files,
                                              tmp_path_factory):
        base = tmp_path_factory.mktemp("scr")
        kept = _run(spark, doc_files, base)
        assert 0 in kept and 1 in kept          # first batch all new
        assert 10 not in kept                   # near-dup of epoch-0 doc
        assert 20 not in kept                   # exact dup of epoch-0 doc
        assert 21 in kept                       # novel survives
        # in-batch near-pair (11, 12): min id survives
        assert 11 in kept and 12 not in kept

    def test_replay_is_idempotent(self, spark, doc_files,
                                  tmp_path_factory):
        """Checkpoint loss replays every batch; epoch-overwrite state
        must converge to the identical survivor set (an append-mode
        store would flag everything as a dup of itself)."""
        base = tmp_path_factory.mktemp("scr_replay")
        first = _run(spark, doc_files, base)
        shutil.rmtree(str(base / "ckpt"))
        again = _run(spark, doc_files, base)
        assert first == again


    def test_matches_batch_store_over_same_prefix(self, spark, doc_files,
                                                  tmp_path_factory):
        """Batch replay of the same ingest order through MinHashStore
        agrees on every cross-batch screening decision."""
        from faisssearcher_spark.operators.incremental import MinHashStore

        base = tmp_path_factory.mktemp("scr_parity")
        kept = _run(spark, doc_files, base)

        store = MinHashStore(spark, str(base / "bstore"), num_hashes=16,
                             bands=8, shingle_n=3)
        all_docs = spark.read.parquet(doc_files)
        batch_kept = set()
        for lo, hi in ((0, 10), (10, 20), (20, 30)):
            b = all_docs.filter(F.col("doc_id").between(lo, hi - 1))
            fresh = store.filter_new(b, threshold=0.5)
            # in-batch est≥threshold keep-min-id, mirroring the sink
            from faisssearcher_spark.operators.incremental import \
                banded_signatures
            sigs = banded_signatures(fresh, num_hashes=16, bands=8,
                                     shingle_n=3)
            est = (F.size(F.filter(
                F.zip_with("__sa", "__sb", lambda x, y: x == y),
                lambda m: m)) / F.lit(16.0))
            dup = (sigs.alias("a").join(
                sigs.alias("b"),
                (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.id") > F.col("b.id")))
                .select(F.col("a.id").alias("__aid"),
                        F.col("b.id").alias("__bid"),
                        F.col("a.sig").alias("__sa"),
                        F.col("b.sig").alias("__sb"))
                .dropDuplicates(["__aid", "__bid"])
                .withColumn("__est", est)
                .filter(F.col("__est") >= 0.5)
                .select("__aid").distinct())
            drop = {r["__aid"] for r in dup.collect()}
            fresh = fresh.filter(~F.col("doc_id").isin(*drop)) \
                if drop else fresh
            batch_kept |= {r["doc_id"] for r in fresh.collect()}
            store.commit(fresh)
        assert kept == batch_kept

    def test_validates_params(self, spark, doc_files, tmp_path_factory):
        base = tmp_path_factory.mktemp("scr_bad")
        stream = (spark.readStream.schema("doc_id long, text string")
                  .parquet(doc_files))
        with pytest.raises(ValueError, match="threshold"):
            minhash_screen_sink(stream, store_dir=str(base / "s"),
                                out_dir=str(base / "o"),
                                checkpoint_dir=str(base / "c"),
                                threshold=1.5)
        with pytest.raises(ValueError, match="divide"):
            minhash_screen_sink(stream, store_dir=str(base / "s"),
                                out_dir=str(base / "o"),
                                checkpoint_dir=str(base / "c"),
                                num_hashes=16, bands=5)


@pytest.fixture(scope="module")
def redelivery_files(spark, tmp_path_factory):
    """3 mtime-ordered files → 3 micro-batches: batch 1 RE-DELIVERS
    doc_id 0 with DIFFERENT text (the at-least-once upstream case the
    watermark exact screen exists for). Event times sit a day past
    epoch 0 (an event time of exactly 0 is discarded as late by the
    initial watermark) and within one minute of each other, so a
    24h watermark never expires a key during the replay."""
    import time

    from pyspark.sql import functions as SF

    batches = [
        [(0, "alpha beta gamma delta epsilon zeta eta theta", 86_400),
         (1, "spark query engines shuffle hash partitions across "
             "executors with adaptive planning", 86_410)],
        [(0, "completely different redelivered payload with novel "
             "vocabulary overlapping nothing else here", 86_420)],
        [(2, "final novel document with vocabulary shared by nothing "
             "else in this stream at all", 86_430)],
    ]
    path = str(tmp_path_factory.mktemp("redeliver_src") / "docs")
    for rows in batches:
        spark.createDataFrame(rows, "doc_id long, text string, sec long") \
            .select("doc_id", "text",
                    SF.timestamp_seconds("sec").alias("ingest_ts")) \
            .coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)
    return path


def _run_exact(spark, src, base, *, exact: bool):
    stream = (spark.readStream
              .schema("doc_id long, text string, ingest_ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    kwargs = dict(exact_dedup_keys="doc_id", event_time_col="ingest_ts",
                  exact_watermark="24 hours") if exact else {}
    q = minhash_screen_sink(
        stream, store_dir=str(base / "store"), out_dir=str(base / "out"),
        checkpoint_dir=str(base / "ckpt"), threshold=0.5,
        num_hashes=16, bands=8, shingle_n=3, **kwargs)
    q.awaitTermination()
    return [(r["doc_id"], r["text"]) for r in
            spark.read.parquet(str(base / "out"))
            .orderBy("doc_id", "text").collect()]


class TestWatermarkExactScreenComposition:
    def test_redelivered_id_passes_without_exact_screen(
            self, spark, redelivery_files, tmp_path_factory):
        """The near-dup screen deliberately treats an id-equal
        re-delivery with NOVEL content as new (equal ids are excluded
        from candidate pairs — the store contract), so doc_id 0 lands
        twice without the exact screen. This is the gap the watermark
        screen closes."""
        rows = _run_exact(spark, redelivery_files,
                          tmp_path_factory.mktemp("noexact"), exact=False)
        assert [d for d, _ in rows].count(0) == 2

    def test_exact_screen_matches_batch_pipeline(
            self, spark, redelivery_files, tmp_path_factory):
        """Parity vs the batch screen: with every duplicate inside the
        watermark, the composed stream equals exact-dedup-keep-earliest
        over the source followed by the same near-dup screen — here the
        hand-derivable survivor set (first delivery of each id)."""
        rows = _run_exact(spark, redelivery_files,
                          tmp_path_factory.mktemp("exact"), exact=True)
        ids = [d for d, _ in rows]
        assert sorted(ids) == [0, 1, 2]
        assert dict(rows)[0].startswith("alpha beta")   # first wins

    def test_exact_screen_requires_event_time(self, spark,
                                              redelivery_files,
                                              tmp_path_factory):
        stream = (spark.readStream
                  .schema("doc_id long, text string, ingest_ts timestamp")
                  .parquet(redelivery_files))
        base = tmp_path_factory.mktemp("bad")
        with pytest.raises(ValueError, match="event_time_col"):
            minhash_screen_sink(
                stream, store_dir=str(base / "s"), out_dir=str(base / "o"),
                checkpoint_dir=str(base / "c"),
                exact_dedup_keys="doc_id")
