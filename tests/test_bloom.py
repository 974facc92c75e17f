"""Bloom membership (operators/bloom.py): the incremental-ingest screen.

Contract pinned here: NO false negatives ever (filter_new never keeps a
fitted key), false positives bounded near the design fpp, decisions are
a pure function of (key, config) — partition-invariant and identical
after save/load — and both hash methods work.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.bloom import (BloomFilter, fit_bloom)


@pytest.fixture(scope="module", params=["md5", "xxhash64"])
def fitted(request, spark, documents):
    ref = documents.filter(F.col("source") == "src1")
    bf = fit_bloom(ref, key_col="doc_id", fpp=0.01,
                   hash_method=request.param)
    return bf, ref


class TestBloom:
    def test_no_false_negatives(self, documents, fitted):
        bf, ref = fitted
        new = bf.filter_new(documents, "doc_id")
        assert ref.join(new.select("doc_id"), "doc_id").count() == 0

    def test_false_positive_rate_bounded(self, documents, fitted):
        bf, ref = fitted
        n_ref = ref.count()
        n_known = bf.filter_known(documents, "doc_id").count()
        n_non_members = documents.count() - n_ref
        fp = n_known - n_ref
        # generous bound: 10x the design fpp over the non-member pool
        assert fp <= max(3, 0.1 * n_non_members)
        assert bf.fpp_estimate < 0.05

    def test_known_new_partition(self, documents, fitted):
        bf, _ = fitted
        nk = bf.filter_known(documents, "doc_id").count()
        nn = bf.filter_new(documents, "doc_id").count()
        assert nk + nn == documents.count()

    def test_partition_invariant(self, documents, fitted):
        bf, _ = fitted
        a = {r["doc_id"] for r in
             bf.filter_known(documents, "doc_id").collect()}
        b = {r["doc_id"] for r in
             bf.filter_known(documents.repartition(13), "doc_id").collect()}
        assert a == b

    def test_save_load_roundtrip(self, spark, documents, fitted, tmp_path):
        bf, _ = fitted
        bf.save(spark, str(tmp_path))
        bf2 = BloomFilter.load(spark, str(tmp_path))
        assert (bf2.words == bf.words).all()
        assert (bf2.n_bits, bf2.n_hashes, bf2.seed, bf2.hash_method) \
            == (bf.n_bits, bf.n_hashes, bf.seed, bf.hash_method)
        a = {r["doc_id"] for r in
             bf.filter_known(documents, "doc_id").collect()}
        b = {r["doc_id"] for r in
             bf2.filter_known(documents, "doc_id").collect()}
        assert a == b

    def test_empty_fit_rejects_nothing(self, spark, documents):
        bf = fit_bloom(documents.filter(F.lit(False)), key_col="doc_id")
        assert bf.n_set_bits == 0
        assert bf.filter_new(documents, "doc_id").count() \
            == documents.count()

    def test_validation(self, documents):
        with pytest.raises(ValueError, match="fpp"):
            fit_bloom(documents, key_col="doc_id", fpp=1.5)
        with pytest.raises(ValueError, match="cap"):
            fit_bloom(documents, key_col="doc_id",
                      n_bits=1 << 40, n_hashes=4)
        with pytest.raises(ValueError, match="hash_method"):
            fit_bloom(documents, key_col="doc_id", hash_method="sha1")

    def test_high_bit_words_survive_roundtrip(self, spark, tmp_path):
        """A word with bit 63 set maps to a negative parquet long and
        back to the same uint64."""
        words = np.zeros(4, dtype=np.uint64)
        words[2] = np.uint64(1) << np.uint64(63)
        bf = BloomFilter(words, n_bits=256, n_hashes=2, seed=1,
                         hash_method="md5", n_items=1)
        bf.save(spark, str(tmp_path))
        bf2 = BloomFilter.load(spark, str(tmp_path))
        assert (bf2.words == words).all()


class TestStreamingIncrementalScreen:
    def test_foreach_batch_screens_against_history(self, spark, tmp_path):
        """The intended deployment shape: a foreachBatch sink screens each
        micro-batch against a Bloom filter of every previously-accepted
        key, then refits the filter with the accepted union — so a key
        replayed in a later batch is rejected without ever joining
        history. FP semantics: a genuinely-new key may be dropped
        (~fpp), but an already-seen key is NEVER accepted twice."""
        import time

        import pyarrow as pa
        import pyarrow.parquet as pq

        landing = tmp_path / "landing"
        landing.mkdir()
        evens = list(range(0, 200, 2))
        everyone = list(range(200))
        pq.write_table(pa.table({"doc_id": pa.array(evens, pa.int64())}),
                       landing / "b1.parquet")
        time.sleep(1.1)  # distinct mtime -> deterministic batch order
        pq.write_table(pa.table({"doc_id": pa.array(everyone, pa.int64())}),
                       landing / "b2.parquet")

        from faisssearcher_spark.operators.bloom import fit_bloom

        state = {"bloom": None}
        accepted: list[int] = []

        def screen(batch_df, batch_id):
            bf = state["bloom"]
            new = batch_df if bf is None \
                else bf.filter_new(batch_df, "doc_id")
            accepted.extend(r["doc_id"] for r in new.collect())
            hist = batch_df.sparkSession.createDataFrame(
                [(k,) for k in accepted], "doc_id long")
            state["bloom"] = fit_bloom(hist, key_col="doc_id", fpp=0.01)

        (spark.readStream.schema("doc_id long")
         .option("maxFilesPerTrigger", 1).parquet(str(landing))
         .writeStream.foreachBatch(screen)
         .trigger(availableNow=True).start().awaitTermination())

        # no key accepted twice (the hard guarantee)
        assert len(accepted) == len(set(accepted))
        # batch 1 was unscreened: every even key accepted
        assert set(evens) <= set(accepted)
        # batch 2's odd keys are new: nearly all pass (fpp may drop a few)
        odds = set(range(1, 200, 2))
        assert len(odds & set(accepted)) >= 0.9 * len(odds)
