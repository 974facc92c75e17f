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

    def test_language_filter(self, spark):
        docs = spark.createDataFrame(
            [(1, GOOD),
             (2, "el la de que y en un una los las " * 3)],
            "doc_id long, text string")
        out = curate.curate_documents(docs, min_quality=0.0,
                                      languages=("en",),
                                      near_dup_threshold=None)
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_near_dup_disabled(self, spark):
        docs = spark.createDataFrame(
            [(1, GOOD), (2, GOOD + " today")],
            "doc_id long, text string")
        out = curate.curate_documents(docs, min_quality=0.0,
                                      near_dup_threshold=None)
        assert out.count() == 2
