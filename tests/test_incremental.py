"""Incremental MinHash store (operators/incremental.py): screening new
batches against persisted history, parameter-identity validation,
estimator semantics, and agreement with the self-join path."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import dedup
from faisssearcher_spark.operators.incremental import (MinHashStore,
                                                       banded_signatures)


@pytest.fixture()
def corpus(spark):
    base = ("the quick brown fox jumps over the lazy dog near the river "
            "bank at dawn while birds sing softly and the cold morning "
            "mist drifts slowly across the quiet water meadow toward the "
            "old stone bridge")
    near = base.replace("dawn", "dusk")
    rows = [(0, base), (1, "spark shuffles hash partitions across the "
                           "cluster under adaptive execution today"),
            (2, "completely unrelated text about columnar io and "
                "vectorized parquet readers everywhere"),
            (10, near),                    # near-dup of 0
            (11, base),                    # exact dup of 0
            (12, "fresh document with its own unique vocabulary entirely "
                 "unlike anything committed before now")]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBandedSignatures:
    def test_shape_and_band_agreement_with_self_join(self, corpus):
        sigs = banded_signatures(corpus, num_hashes=16, bands=4,
                                 shingle_n=3)
        rows = sigs.collect()
        assert {r["band_idx"] for r in rows} == {0, 1, 2, 3}
        assert all(len(r["sig"]) == 16 for r in rows)
        # identical documents agree on every band key
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["id"], {})[r["band_idx"]] = r["band_key"]
        assert by_doc[0] == by_doc[11]

    def test_bands_must_divide(self, corpus):
        with pytest.raises(ValueError, match="divide"):
            banded_signatures(corpus, num_hashes=16, bands=5)


class TestStore:
    def test_screen_finds_committed_near_dups(self, spark, corpus,
                                              tmp_path):
        store = MinHashStore(spark, str(tmp_path / "s"), num_hashes=16,
                             bands=8, shingle_n=3)
        store.commit(corpus.filter(F.col("doc_id") < 10))
        hits = store.screen(corpus.filter(F.col("doc_id") >= 10),
                            threshold=0.5).collect()
        got = {(r["new_id"], r["known_id"]): r["est_jaccard"]
               for r in hits}
        assert got[(11, 0)] == 1.0          # exact dup: every slot agrees
        assert (10, 0) in got               # near-dup found
        assert all(nid != 12 for nid, _ in got)   # fresh doc clean

    def test_filter_new_drops_only_screened(self, spark, corpus, tmp_path):
        # bands=8 (r=2): band-agree probability ≈ 1−(1−J²)^8 ≈ 0.9999
        # at the planted pair's J ≈ 0.84 — the r=4 default was a ~6%
        # deterministic-but-fragile miss on these exact hash values
        store = MinHashStore(spark, str(tmp_path / "s"), bands=8)
        store.commit(corpus.filter(F.col("doc_id") < 10))
        kept = store.filter_new(corpus.filter(F.col("doc_id") >= 10),
                                threshold=0.5)
        assert sorted(r["doc_id"] for r in kept.collect()) == [12]

    def test_incremental_commits_accumulate(self, spark, corpus, tmp_path):
        store = MinHashStore(spark, str(tmp_path / "s"))
        store.commit(corpus.filter(F.col("doc_id") == 0))
        assert not store.screen(
            corpus.filter(F.col("doc_id") == 1), threshold=0.5).count()
        store.commit(corpus.filter(F.col("doc_id") == 1))
        hits = store.screen(corpus.filter(F.col("doc_id") == 11),
                            threshold=0.9)
        assert [r["known_id"] for r in hits.collect()] == [0]

    def test_parameter_identity_validated(self, spark, corpus, tmp_path):
        path = str(tmp_path / "s")
        MinHashStore(spark, path, num_hashes=16).commit(corpus)
        with pytest.raises(ValueError, match="original parameters"):
            MinHashStore(spark, path, num_hashes=8)

    def test_estimate_tracks_exact_jaccard(self, spark, corpus, tmp_path):
        """est_jaccard is the slot-agreement estimator of the true
        shingle Jaccard — within the binomial half-width at k=32."""
        store = MinHashStore(spark, str(tmp_path / "s"), num_hashes=32,
                             bands=8, shingle_n=3)
        store.commit(corpus.filter(F.col("doc_id") == 0))
        est = store.screen(corpus.filter(F.col("doc_id") == 10),
                           threshold=0.1).collect()[0]["est_jaccard"]
        exact = dedup.ngram_jaccard_join(
            corpus.filter(F.col("doc_id").isin(0, 10)), n=3,
            threshold=0.0).collect()[0]["jaccard"]
        assert abs(est - exact) <= 0.3      # ~2σ at J(1−J)/32

    def test_equal_ids_excluded(self, spark, corpus, tmp_path):
        store = MinHashStore(spark, str(tmp_path / "s"))
        batch = corpus.filter(F.col("doc_id") == 0)
        store.commit(batch)
        assert store.screen(batch, threshold=0.1).count() == 0

    def test_bucketed_mode_matches_path_mode_without_state_shuffle(
            self, spark, corpus, tmp_path):
        """bucketed_table state screens identically AND the candidate
        join reads the history bucket-aligned: the state-side scan shows
        Bucketed: true and carries no Exchange above it."""
        plain = MinHashStore(spark, str(tmp_path / "p"), bands=8)
        plain.commit(corpus.filter(F.col("doc_id") < 10))
        bucketed = MinHashStore(spark, str(tmp_path / "b"), bands=8,
                                bucketed_table="t_mhstore_test",
                                n_buckets=8)
        try:
            bucketed.commit(corpus.filter(F.col("doc_id") < 10))
            batch = corpus.filter(F.col("doc_id") >= 10)
            a = sorted(map(tuple, plain.screen(batch, threshold=0.5)
                           .collect()))
            b = sorted(map(tuple, bucketed.screen(batch, threshold=0.5)
                           .collect()))
            assert a == b and a           # same hits, and there are hits
            old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                plan = bucketed.screen(batch, threshold=0.5)._jdf \
                    .queryExecution().executedPlan().toString()
            finally:
                spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                               old)
            assert "Bucketed: true" in plan
            # the HISTORY side reads shuffle-free: between the join and
            # the bucketed table's FileScan there must be no Exchange
            # (the batch side legitimately co-partitions into the
            # bucket count, and dedup above the join has its own)
            scan_at = plan.index(
                "FileScan parquet spark_catalog.default.t_mhstore_test")
            join_at = plan.rindex("SortMergeJoin", 0, scan_at)
            seg = plan[join_at:scan_at].splitlines()[1:]
            # first-child (batch) subtree lines carry the ':' tree rail;
            # what's left is the state branch down to its FileScan
            state_branch = [l for l in seg
                            if not l.lstrip().startswith(":")]
            assert not any("Exchange" in l for l in state_branch)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_mhstore_test")

    def test_threshold_validated(self, spark, corpus, tmp_path):
        store = MinHashStore(spark, str(tmp_path / "s"))
        store.commit(corpus)
        with pytest.raises(ValueError, match="threshold"):
            store.screen(corpus, threshold=0.0)
