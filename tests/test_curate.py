"""Tests for the composed curation pipeline (operators/curate.py)."""

from pyspark.sql import functions as F

from faisssearcher_spark.operators import curate


GOOD = ("the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest looking for a quiet place to rest")


class TestCurate:
    def test_pipeline_stages(self, spark):
        docs = spark.createDataFrame(
            [(1, GOOD),                        # survives
             (2, GOOD),                        # exact dup of 1 -> dropped
             (3, GOOD + " today"),             # near dup of 1 -> dropped
             (4, "x y"),                       # too short -> quality drop
             (5, "the cat sat on a mat and it is a very fine mat for cats "
                 "to sit on all day in the warm sun by the old wooden door")],
            "doc_id long, text string")
        out = curate.curate_documents(docs, min_quality=0.3,
                                      near_dup_threshold=0.3)
        ids = sorted(r["doc_id"] for r in out.collect())
        assert ids == [1, 5]

    def test_gopher_repetition_thresholds(self, spark):
        """Opt-in Gopher caps drop the repetitive docs; defaults (None)
        leave the established pipeline result untouched."""
        spam_line = "buy now best price deal today only limited offer"
        repetitive_lines = "\n".join([spam_line] * 6 + [GOOD])
        repetitive_grams = " ".join(
            ["one two three four five"] * 8) + " " + GOOD
        docs = spark.createDataFrame(
            [(1, GOOD), (2, repetitive_lines), (3, repetitive_grams)],
            "doc_id long, text string")
        base = curate.curate_documents(docs, min_quality=0.0,
                                       near_dup_threshold=None)
        assert sorted(r["doc_id"] for r in base.collect()) == [1, 2, 3]
        assert sorted(base.columns) == sorted(
            ["doc_id", "quality", "lang_pred", "n_tokens"])
        capped = curate.curate_documents(
            docs, min_quality=0.0, near_dup_threshold=None,
            gopher_max_dup_line_frac=0.3, gopher_max_dup_ngram_frac=0.3)
        assert sorted(r["doc_id"] for r in capped.collect()) == [1]
        assert sorted(capped.columns) == sorted(base.columns)

    def test_language_filter(self, spark):
        docs = spark.createDataFrame(
            [(1, GOOD),
             (2, "el la de que y en un una los las " * 3)],
            "doc_id long, text string")
        out = curate.curate_documents(docs, min_quality=0.0,
                                      languages=("en",),
                                      near_dup_threshold=None)
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_min_lang_conf_threshold(self, spark):
        """Opt-in confidence gate: a doc whose argmax rests on one
        stopword hit drops at a threshold a clean-prose doc clears;
        default (None) keeps the established contract (no lang_conf
        column)."""
        # one 'the' in otherwise-neutral text: argmax says 'en' but the
        # softmax stays near uniform
        weak = "the " + " ".join(f"zz{i}" for i in range(30))
        docs = spark.createDataFrame(
            [(1, GOOD), (2, weak)], "doc_id long, text string")
        base = curate.curate_documents(docs, min_quality=0.0,
                                       languages=("en",),
                                       near_dup_threshold=None)
        assert sorted(r["doc_id"] for r in base.collect()) == [1, 2]
        assert "lang_conf" not in base.columns
        conf = curate.curate_documents(docs, min_quality=0.0,
                                       languages=("en",),
                                       min_lang_conf=0.5,
                                       near_dup_threshold=None)
        rows = {r["doc_id"]: r for r in conf.collect()}
        assert sorted(rows) == [1]
        assert rows[1]["lang_conf"] > 0.5

    def test_near_dup_disabled(self, spark):
        docs = spark.createDataFrame(
            [(1, GOOD), (2, GOOD + " today")],
            "doc_id long, text string")
        out = curate.curate_documents(docs, min_quality=0.0,
                                      near_dup_threshold=None)
        assert out.count() == 2

    def test_keep_text_appends_text(self, spark):
        docs = spark.createDataFrame(
            [(1, GOOD), (2, GOOD)], "doc_id long, text string")
        out = curate.curate_documents(docs, min_quality=0.0,
                                      near_dup_threshold=None,
                                      keep_text=True)
        rows = out.collect()
        assert [r["doc_id"] for r in rows] == [1]
        assert rows[0]["text"] == GOOD

    def test_lang_conf_temperature_threads(self, spark):
        """A hotter softmax flattens confidence: the same doc reads a
        LOWER lang_conf at temperature 1.0 than at the 0.05 default —
        recipes tuning detect_languages' temperature keep threshold
        semantics consistent on the pipeline surface."""
        docs = spark.createDataFrame([(1, GOOD)],
                                     "doc_id long, text string")
        cold = curate.curate_documents(
            docs, min_quality=0.0, min_lang_conf=0.0,
            near_dup_threshold=None).collect()[0]["lang_conf"]
        hot = curate.curate_documents(
            docs, min_quality=0.0, min_lang_conf=0.0,
            lang_conf_temperature=1.0,
            near_dup_threshold=None).collect()[0]["lang_conf"]
        assert hot < cold

    def test_exsub_stage_cleans_chunks(self, spark):
        """Opt-in ExactSubstr removal between dedup and chunking: the
        planted duplicated run vanishes from every training chunk while
        unique text survives."""
        run = " ".join(f"boiler{i}" for i in range(12))
        docs = spark.createDataFrame(
            [(1, GOOD + " " + run),
             (2, run + " " + "the cat sat on a mat and it is a very "
                 "fine mat for cats to sit on all day in the warm sun")],
            "doc_id long, text string")
        out = curate.prepare_pretraining_data(
            docs, near_dup_threshold=None, exsub_min_len=10,
            chunk_max_tokens=64, pack_budget=256)
        texts = [r["chunk_text"] for r in out.collect()]
        assert texts, "pipeline dropped everything"
        assert all("boiler0" not in t for t in texts)
        assert any("quick brown fox" in t for t in texts)

    def test_exsub_auto_spelling(self, spark):
        """min_len='auto' composes through the recipe: the planted-block
        corpus has a knee, so auto resolves and removes the block."""
        block = " ".join(f"dup{i}" for i in range(32))
        rows = [(i, f"unique{i} " + block + f" tail{i} " + " ".join(
            f"w{i}_{j}" for j in range(16))) for i in range(12)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = curate.prepare_pretraining_data(
            docs, min_quality=0.0, near_dup_threshold=None,
            exsub_min_len="auto", chunk_max_tokens=64, pack_budget=256)
        texts = [r["chunk_text"] for r in out.collect()]
        assert texts
        assert all("dup0 " not in t + " " for t in texts)

    def test_exsub_streaming_refusal(self, spark, tmp_path):
        """Streaming parity: curate_stream refuses exsub_min_len loudly
        (whole-corpus self-join + eager profile cannot stream)."""
        import pytest

        from faisssearcher_spark.streaming.curate import curate_stream

        src = spark.readStream.format("rate").load().select(
            F.col("value").alias("doc_id"),
            F.lit(GOOD).alias("text"),
            F.col("timestamp").alias("ingest_ts"))
        with pytest.raises(ValueError, match="batch-only"):
            curate_stream(src, exsub_min_len=10)

    def test_internal_caches_release_with_result(self, spark):
        """The landing caches' lifetime is tied to the result object
        (_release_with): invocations no longer accumulate executor
        storage once their results are dropped."""
        import gc

        docs = spark.createDataFrame(
            [(i, GOOD + f" extra{i}") for i in range(8)],
            "doc_id long, text string")
        sc = spark.sparkContext
        # delta-based: other fixtures (conftest's cached tables) may
        # legitimately hold storage in a shared session
        base = len(sc._jsc.sc().getRDDStorageInfo())
        out = curate.curate_documents(docs, min_quality=0.0,
                                      near_dup_threshold=0.3)
        out.count()   # materializes the internal landing persist
        assert len(sc._jsc.sc().getRDDStorageInfo()) > base
        del out
        gc.collect()
        assert len(sc._jsc.sc().getRDDStorageInfo()) == base

    def test_prepare_accepts_landing_frame(self, spark):
        """curated= skips the curate stage: same chunks as the internal
        path, and the caller-owned landing cache survives the result."""
        import gc

        docs = spark.createDataFrame(
            [(1, GOOD), (2, GOOD),
             (3, "the cat sat on a mat and it is a very fine mat for "
                 "cats to sit on all day in the warm sun by the door")],
            "doc_id long, text string")
        internal = curate.prepare_pretraining_data(
            docs, near_dup_threshold=0.3, chunk_max_tokens=32,
            pack_budget=128)
        expected = sorted((r["doc_id"], r["chunk_idx"], r["chunk_text"])
                          for r in internal.collect())
        del internal
        gc.collect()
        landing = curate.curate_documents(
            docs, near_dup_threshold=0.3, keep_text=True) \
            .select("doc_id", "text").persist()
        got_df = curate.prepare_pretraining_data(
            docs, curated=landing, chunk_max_tokens=32, pack_budget=128)
        got = sorted((r["doc_id"], r["chunk_idx"], r["chunk_text"])
                     for r in got_df.collect())
        assert got == expected
        del got_df
        gc.collect()
        # caller-owned landing frame still cached
        assert landing.storageLevel.useMemory
        landing.unpersist(True)

    def test_exsub_auto_error_releases_caches(self, spark):
        """The documented-eager 'auto' raise on a no-duplication corpus
        must not orphan the already-persisted landing frames
        (_release_on_error)."""
        import pytest

        docs = spark.createDataFrame(
            [(i, " ".join(f"tok{i}_{j}" for j in range(30)))
             for i in range(6)],
            "doc_id long, text string")
        sc = spark.sparkContext
        base = len(sc._jsc.sc().getRDDStorageInfo())
        with pytest.raises(ValueError):
            curate.prepare_pretraining_data(
                docs, min_quality=0.0, near_dup_threshold=None,
                exsub_min_len="auto")
        assert len(sc._jsc.sc().getRDDStorageInfo()) == base
