"""Incremental embedding near-dup store (operators/incremental.py
EmbeddingStore — the sign-LSH + fp16 analog of MinHashStore)."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.incremental import EmbeddingStore


@pytest.fixture(scope="module")
def history(embeddings):
    return embeddings.filter(F.col("vec_id") < 60)


@pytest.fixture(scope="module")
def batch(embeddings):
    """20 genuinely new vectors + 5 exact copies of history under new
    ids (the 'seen before' cases the store exists to catch)."""
    fresh = embeddings.filter((F.col("vec_id") >= 60)
                              & (F.col("vec_id") < 80))
    copies = embeddings.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    return fresh.unionByName(copies)


def _store(spark, path, **kw):
    args = dict(dim=64, tables=8, bits=6)
    args.update(kw)
    return EmbeddingStore(spark, str(path), **args)


class TestEmbeddingStore:
    def test_screen_finds_committed_copies(self, spark, history, batch,
                                           tmp_path):
        st = _store(spark, tmp_path / "s")
        st.commit(history)
        hits = st.screen(batch, threshold=0.99).collect()
        found = {r["new_id"] for r in hits}
        # every planted copy screens against its original, nothing else
        # reaches 0.99 on the isotropic corpus
        assert found == {100000 + i for i in range(5)}
        for r in hits:
            assert r["known_id"] == r["new_id"] - 100000
            # fp16 decode keeps an exact copy's cosine within rounding
            assert r["cos_sim"] >= 0.999

    def test_filter_new_drops_only_screened(self, spark, history, batch,
                                            tmp_path):
        st = _store(spark, tmp_path / "s")
        st.commit(history)
        kept = st.filter_new(batch, threshold=0.99)
        assert kept.count() == 20
        assert kept.filter(F.col("vec_id") >= 100000).count() == 0

    def test_commits_accumulate(self, spark, embeddings, batch,
                                tmp_path):
        st = _store(spark, tmp_path / "s")
        st.commit(embeddings.filter(F.col("vec_id") < 3))
        st.commit(embeddings.filter((F.col("vec_id") >= 3)
                                    & (F.col("vec_id") < 5)))
        found = {r["new_id"]
                 for r in st.screen(batch, threshold=0.99).collect()}
        assert found == {100000 + i for i in range(5)}

    def test_empty_store_screens_nothing(self, spark, batch, tmp_path):
        st = _store(spark, tmp_path / "s")
        out = st.screen(batch)
        assert out.columns == ["new_id", "known_id", "cos_sim"]
        assert out.count() == 0

    def test_parameter_identity_validated(self, spark, history,
                                          tmp_path):
        st = _store(spark, tmp_path / "s")
        st.commit(history)
        with pytest.raises(ValueError, match="original parameters"):
            _store(spark, tmp_path / "s", tables=4)
        with pytest.raises(ValueError, match="original parameters"):
            _store(spark, tmp_path / "s", dim=32)

    def test_threshold_and_dim_validated(self, spark, tmp_path):
        with pytest.raises(ValueError, match="dim"):
            _store(spark, tmp_path / "s", dim=0)
        st = _store(spark, tmp_path / "s2")
        with pytest.raises(ValueError, match="threshold"):
            st.screen(st.spark.range(0).select(
                F.col("id").alias("vec_id"),
                F.array(F.lit(0.0)).alias("embedding")), threshold=1.5)

    def test_bucketed_mode_matches_path_mode_without_state_shuffle(
            self, spark, history, batch, tmp_path):
        """Same contract as MinHashStore's bucketed mode: identical
        hits, Bucketed: true on the state scan, and no Exchange on the
        history side of the screen join."""
        plain = _store(spark, tmp_path / "p")
        plain.commit(history)
        bucketed = _store(spark, tmp_path / "b",
                          bucketed_table="t_estore_test", n_buckets=8)
        try:
            bucketed.commit(history)
            a = sorted(map(tuple,
                           plain.screen(batch, threshold=0.99).collect()))
            b = sorted(map(tuple, bucketed.screen(batch, threshold=0.99)
                           .collect()))
            assert a == b and a
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                plan = bucketed.screen(batch, threshold=0.99)._jdf \
                    .queryExecution().executedPlan().toString()
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                               old)
            assert "Bucketed: true" in plan
            scan_at = plan.index(
                "FileScan parquet spark_catalog.default.t_estore_test")
            join_at = plan.rindex("SortMergeJoin", 0, scan_at)
            seg = plan[join_at:scan_at].splitlines()[1:]
            state_branch = [l for l in seg
                            if not l.lstrip().startswith(":")]
            assert not any("Exchange" in l for l in state_branch)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_estore_test")
