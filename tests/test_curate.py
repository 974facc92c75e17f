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
