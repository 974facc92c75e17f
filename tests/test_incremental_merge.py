"""MERGE/upsert + compaction on the three incremental stores
(operators/incremental.py:_merge_state/_rewrite_state — one shared
code path): stale vintages are deleted and replaced, compaction
collapses replayed duplicates without changing screen results, the
pointer swap is visible to fresh instances, and the bucketed-table
mode rewrites under the same bucketing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.incremental import (EmbeddingStore,
                                                       FingerprintStore,
                                                       MinHashStore)

BASE = ("the quick brown fox jumps over the lazy dog near the river "
        "bank at dawn while birds sing softly and the cold morning "
        "mist drifts slowly across the quiet water meadow toward the "
        "old stone bridge")
OTHER = ("spark shuffles hash partitions across the cluster under "
         "adaptive query execution with columnar parquet readers and "
         "vectorized expression evaluation in every single stage today")


def _mh(spark, path, **kw):
    return MinHashStore(spark, path, num_hashes=16, bands=4,
                        shingle_n=3, **kw)


class TestMinHashUpsert:
    def test_upsert_replaces_stale_vintage(self, spark, tmp_path):
        store = _mh(spark, str(tmp_path / "s"))
        # WRONG vintage: doc 0 committed with OTHER's text
        store.commit(spark.createDataFrame([(0, OTHER)],
                                           "doc_id long, text string"))
        store.upsert(spark.createDataFrame([(0, BASE)],
                                           "doc_id long, text string"))
        probe_other = spark.createDataFrame([(100, OTHER)],
                                            "doc_id long, text string")
        probe_base = spark.createDataFrame([(101, BASE)],
                                           "doc_id long, text string")
        # the stale vintage is GONE ...
        assert store.screen(probe_other, threshold=0.5).count() == 0
        # ... and the corrected one answers
        hits = store.screen(probe_base, threshold=0.5).collect()
        assert [(r["new_id"], r["known_id"], r["est_jaccard"])
                for r in hits] == [(101, 0, 1.0)]

    def test_upsert_on_empty_store_is_commit(self, spark, tmp_path):
        a = _mh(spark, str(tmp_path / "a"))
        b = _mh(spark, str(tmp_path / "b"))
        batch = spark.createDataFrame([(0, BASE), (1, OTHER)],
                                      "doc_id long, text string")
        a.commit(batch)
        b.upsert(batch)
        probe = spark.createDataFrame([(9, BASE)],
                                      "doc_id long, text string")
        assert sorted(map(tuple, a.screen(probe, threshold=0.5)
                          .collect())) == \
            sorted(map(tuple, b.screen(probe, threshold=0.5).collect()))

    def test_upsert_untouched_ids_survive(self, spark, tmp_path):
        store = _mh(spark, str(tmp_path / "s"))
        store.commit(spark.createDataFrame([(0, BASE), (1, OTHER)],
                                           "doc_id long, text string"))
        store.upsert(spark.createDataFrame(
            [(0, "totally new corrected body of text entirely")],
            "doc_id long, text string"))
        probe = spark.createDataFrame([(9, OTHER)],
                                      "doc_id long, text string")
        hits = store.screen(probe, threshold=0.5).collect()
        assert [(r["new_id"], r["known_id"]) for r in hits] == [(9, 1)]

    def test_compact_collapses_replays_screen_identical(self, spark,
                                                        tmp_path):
        """Replayed commits duplicate state rows; compact() removes
        them and the screen result is row-identical to a single-commit
        store's."""
        once = _mh(spark, str(tmp_path / "once"))
        twice = _mh(spark, str(tmp_path / "twice"))
        batch = spark.createDataFrame([(0, BASE), (1, OTHER)],
                                      "doc_id long, text string")
        once.commit(batch)
        twice.commit(batch)
        twice.commit(batch)          # replay
        n_dup = twice.state().count()
        twice.compact()
        assert twice.state().count() == n_dup // 2 == once.state().count()
        probe = spark.createDataFrame([(9, BASE)],
                                      "doc_id long, text string")
        assert sorted(map(tuple, once.screen(probe, threshold=0.5)
                          .collect())) == \
            sorted(map(tuple, twice.screen(probe, threshold=0.5)
                       .collect()))

    def test_pointer_swap_visible_to_fresh_instance(self, spark,
                                                    tmp_path):
        path = str(tmp_path / "s")
        store = _mh(spark, path)
        store.commit(spark.createDataFrame([(0, OTHER)],
                                           "doc_id long, text string"))
        store.upsert(spark.createDataFrame([(0, BASE)],
                                           "doc_id long, text string"))
        reopened = _mh(spark, path)
        probe = spark.createDataFrame([(9, BASE)],
                                      "doc_id long, text string")
        hits = reopened.screen(probe, threshold=0.5).collect()
        assert [(r["new_id"], r["known_id"]) for r in hits] == [(9, 0)]
        # and a later append lands in the ACTIVE (post-swap) directory
        reopened.commit(spark.createDataFrame([(1, OTHER)],
                                              "doc_id long, text string"))
        probe2 = spark.createDataFrame([(8, OTHER)],
                                       "doc_id long, text string")
        assert _mh(spark, path).screen(probe2, threshold=0.5).count() == 1

    def test_upsert_to_empty_text_clears_state(self, spark, tmp_path):
        """A row corrected to produce NO state rows still clears its
        stale rows — the delete-key set comes from the batch."""
        store = _mh(spark, str(tmp_path / "s"))
        store.commit(spark.createDataFrame([(0, BASE)],
                                           "doc_id long, text string"))
        store.upsert(spark.createDataFrame([(0, "")],
                                           "doc_id long, text string"))
        probe = spark.createDataFrame([(9, BASE)],
                                      "doc_id long, text string")
        assert store.screen(probe, threshold=0.5).count() == 0

    def test_bucketed_mode_upsert(self, spark, tmp_path):
        store = _mh(spark, str(tmp_path / "b"),
                    bucketed_table="t_mh_merge_test", n_buckets=8)
        try:
            store.commit(spark.createDataFrame(
                [(0, OTHER)], "doc_id long, text string"))
            store.upsert(spark.createDataFrame(
                [(0, BASE)], "doc_id long, text string"))
            probe = spark.createDataFrame([(9, BASE)],
                                          "doc_id long, text string")
            hits = store.screen(probe, threshold=0.5).collect()
            assert [(r["new_id"], r["known_id"]) for r in hits] == [(9, 0)]
            probe_o = spark.createDataFrame([(8, OTHER)],
                                            "doc_id long, text string")
            assert store.screen(probe_o, threshold=0.5).count() == 0
            # overwrite preserved the bucketed layout + identity stamp
            plan = store.screen(probe, threshold=0.5)._jdf \
                .queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            assert store._read_table_meta() == store._identity()
            # bucketed COMPACT: replay a commit, compact, screen rows
            # identical, layout + stamp survive the second overwrite
            store.commit(spark.createDataFrame(
                [(1, OTHER)], "doc_id long, text string"))
            store.commit(spark.createDataFrame(
                [(1, OTHER)], "doc_id long, text string"))
            probe_o2 = spark.createDataFrame([(7, OTHER)],
                                             "doc_id long, text string")
            before = sorted(map(tuple, store.screen(probe_o2,
                                                    threshold=0.5)
                                .collect()))
            n = store.state().count()
            store.compact()
            assert store.state().count() < n
            after = sorted(map(tuple, store.screen(probe_o2,
                                                   threshold=0.5)
                               .collect()))
            assert before == after and after
            plan = store.screen(probe_o2, threshold=0.5)._jdf \
                .queryExecution().executedPlan().toString()
            assert "Bucketed: true" in plan
            assert store._read_table_meta() == store._identity()
        finally:
            spark.sql("DROP TABLE IF EXISTS t_mh_merge_test")


class TestEmbeddingUpsert:
    def test_upsert_and_compact_parity(self, spark, tmp_path):
        dim = 8
        v = [1.0] + [0.0] * (dim - 1)
        w = [0.0] * (dim - 1) + [1.0]
        mk = lambda rows: spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        store = EmbeddingStore(spark, str(tmp_path / "e"), dim=dim,
                               tables=2, bits=2)
        store.commit(mk([(0, w)]))           # wrong vintage
        store.upsert(mk([(0, v)]))
        hits = store.screen(mk([(9, v)]), threshold=0.9).collect()
        assert [(r["new_id"], r["known_id"]) for r in hits] == [(9, 0)]
        assert store.screen(mk([(8, w)]), threshold=0.9).count() == 0
        store.commit(mk([(1, w)]))
        store.commit(mk([(1, w)]))           # replay
        before = sorted(map(tuple, store.screen(mk([(8, w)]),
                                                threshold=0.9).collect()))
        n = store.state().count()
        store.compact()
        assert store.state().count() < n
        after = sorted(map(tuple, store.screen(mk([(8, w)]),
                                               threshold=0.9).collect()))
        assert before == after and after


class TestFingerprintUpsert:
    def test_upsert_and_compact_parity(self, spark, tmp_path):
        mk = lambda rows: spark.createDataFrame(rows, "id long, fp long")
        store = FingerprintStore(spark, str(tmp_path / "f"), bits=32,
                                 max_hamming=3)
        store.commit(mk([(0, 0xDEADBEEF)]))      # wrong vintage
        store.upsert(mk([(0, 0x12345678)]))
        hits = store.screen(mk([(9, 0x12345678)])).collect()
        assert [(r["new_id"], r["known_id"], r["hamming"])
                for r in hits] == [(9, 0, 0)]
        assert store.screen(mk([(8, 0xDEADBEEF)])).count() == 0
        store.commit(mk([(1, 0xCAFEBABE)]))
        store.commit(mk([(1, 0xCAFEBABE)]))      # replay
        before = sorted(map(tuple,
                            store.screen(mk([(7, 0xCAFEBABE)])).collect()))
        n = store.state().count()
        store.compact()
        assert store.state().count() < n
        after = sorted(map(tuple,
                           store.screen(mk([(7, 0xCAFEBABE)])).collect()))
        assert before == after and after

    def test_upsert_with_null_fp_clears_state(self, spark, tmp_path):
        store = FingerprintStore(spark, str(tmp_path / "f"), bits=32,
                                 max_hamming=3)
        store.commit(spark.createDataFrame([(0, 0x12345678)],
                                           "id long, fp long"))
        store.upsert(spark.createDataFrame([(0, None)],
                                           "id long, fp long"))
        assert store.screen(spark.createDataFrame(
            [(9, 0x12345678)], "id long, fp long")).count() == 0


class TestCrashRecovery:
    def test_propertyless_table_heals_when_path_meta_proves_ownership(
            self, spark, tmp_path):
        """A crash between a rewrite's overwrite and its property
        re-stamp leaves the table property-less; reopening with the
        PATH meta present must re-stamp and continue (crash recovery),
        while a fresh path against a property-less table still
        refuses (foreign-table guard)."""
        path = str(tmp_path / "b")
        store = _mh(spark, path, bucketed_table="t_mh_crash_test",
                    n_buckets=8)
        try:
            store.commit(spark.createDataFrame(
                [(0, BASE)], "doc_id long, text string"))
            spark.sql("ALTER TABLE t_mh_crash_test UNSET TBLPROPERTIES "
                      f"('{store._META_PROP}')")
            reopened = _mh(spark, path, bucketed_table="t_mh_crash_test",
                           n_buckets=8)
            assert reopened._read_table_meta() == reopened._identity()
            probe = spark.createDataFrame([(9, BASE)],
                                          "doc_id long, text string")
            assert reopened.screen(probe, threshold=0.5).count() == 1
            # a FRESH path (no meta) against a property-less table
            # still refuses
            spark.sql("ALTER TABLE t_mh_crash_test UNSET TBLPROPERTIES "
                      f"('{store._META_PROP}')")
            with pytest.raises(ValueError, match="refusing"):
                _mh(spark, str(tmp_path / "fresh"),
                    bucketed_table="t_mh_crash_test", n_buckets=8)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_mh_crash_test")


class TestEpochLayout:
    """layout='epoch': bounded merges (append an epoch + tombstones)
    must behave EXACTLY like the flat layout's full-rewrite merges."""

    def test_upsert_parity_with_flat_and_is_bounded(self, spark,
                                                    tmp_path):
        import os

        flat = _mh(spark, str(tmp_path / "f"))
        ep = _mh(spark, str(tmp_path / "e"), layout="epoch")
        b0 = spark.createDataFrame([(0, OTHER), (1, BASE)],
                                   "doc_id long, text string")
        fix1 = spark.createDataFrame([(0, BASE)],
                                     "doc_id long, text string")
        fix2 = spark.createDataFrame(
            [(0, "a third completely different corrected body")],
            "doc_id long, text string")
        for s in (flat, ep):
            s.commit(b0)
            s.upsert(fix1)
            s.upsert(fix1)     # replayed correction
            s.upsert(fix2)     # re-correction of the SAME id
        for probe_text, expect in ((BASE, {(9, 1)}), (OTHER, set())):
            probe = spark.createDataFrame([(9, probe_text)],
                                          "doc_id long, text string")
            got_f = {(r["new_id"], r["known_id"]) for r in
                     flat.screen(probe, threshold=0.5).collect()}
            got_e = {(r["new_id"], r["known_id"]) for r in
                     ep.screen(probe, threshold=0.5).collect()}
            assert got_f == got_e == expect
        # BOUNDED: the original epoch was never rewritten — all four
        # epochs exist and tombstones accumulated
        sdir = str(tmp_path / "e" / "state")
        assert sorted(os.listdir(sdir))[:1] == ["epoch=0"]
        assert len([d for d in os.listdir(sdir)
                    if d.startswith("epoch=")]) == 4
        assert os.path.isdir(str(tmp_path / "e" / "tombstones"))

    def test_compact_folds_epochs_and_clears_tombstones(self, spark,
                                                        tmp_path):
        import os

        ep = _mh(spark, str(tmp_path / "e"), layout="epoch")
        ep.commit(spark.createDataFrame([(0, OTHER), (1, BASE)],
                                        "doc_id long, text string"))
        ep.upsert(spark.createDataFrame([(0, BASE)],
                                        "doc_id long, text string"))
        before = sorted(map(tuple, ep.state().collect()))
        ep.compact()
        after = sorted(map(tuple, ep.state().collect()))
        assert before == after and after
        assert not os.path.isdir(str(tmp_path / "e" / "tombstones"))
        active = ep._active_state_name()
        subdirs = sorted(d for d in
                         os.listdir(str(tmp_path / "e" / active))
                         if d.startswith("epoch="))
        # BOUNDED: the tombstone (id 0, upto 0) touches only epoch 0,
        # whose survivors folded into a fresh epoch 2; epoch 1 (id 0's
        # corrected rows) carried over UNTOUCHED by hardlink
        assert subdirs == ["epoch=1", "epoch=2"]
        probe = spark.createDataFrame([(9, OTHER)],
                                      "doc_id long, text string")
        assert ep.screen(probe, threshold=0.5).count() == 0
        # full=True folds the whole state to one epoch
        ep.compact(full=True)
        assert sorted(map(tuple, ep.state().collect())) == after
        active = ep._active_state_name()
        subdirs = [d for d in os.listdir(str(tmp_path / "e" / active))
                   if d.startswith("epoch=")]
        assert len(subdirs) == 1
        assert ep.screen(probe, threshold=0.5).count() == 0

    def test_bounded_compact_prunes_by_id_range(self, spark, tmp_path):
        """Id-range pruning: tombstones confined to one epoch's id
        range leave the OTHER epochs' files untouched (same inode
        after compact — hardlinked, not rewritten), and a no-op
        tombstone set clears without any state rewrite."""
        import os

        ep = _mh(spark, str(tmp_path / "e"), layout="epoch")
        for base in (0, 100, 200):
            ep.commit(spark.createDataFrame(
                [(base + i, f"{BASE} marker {base + i}") for i in range(3)],
                "doc_id long, text string"))
        root = str(tmp_path / "e")

        def _inodes(name, epoch):
            d = os.path.join(root, name, f"epoch={epoch}")
            return {fn: os.stat(os.path.join(d, fn)).st_ino
                    for fn in os.listdir(d) if fn.endswith(".parquet")}

        old_active = ep._active_state_name()
        ino0, ino2 = _inodes(old_active, 0), _inodes(old_active, 2)
        # correction inside epoch 1's id range only
        ep.upsert(spark.createDataFrame([(101, OTHER)],
                                        "doc_id long, text string"))
        before = sorted(map(tuple, ep.state().collect()))
        ep.compact()
        assert sorted(map(tuple, ep.state().collect())) == before
        new_active = ep._active_state_name()
        assert new_active != old_active
        # epochs 0 and 2 hardlinked (same inodes); epoch 1 folded away
        assert _inodes(new_active, 0) == ino0
        assert _inodes(new_active, 2) == ino2
        dirs = sorted(d for d in
                      os.listdir(os.path.join(root, new_active))
                      if d.startswith("epoch="))
        assert "epoch=1" not in dirs and "epoch=4" in dirs
        assert not os.path.isdir(os.path.join(root, "tombstones"))

    def test_empty_correction_clears_state(self, spark, tmp_path):
        ep = _mh(spark, str(tmp_path / "e"), layout="epoch")
        ep.commit(spark.createDataFrame([(0, BASE)],
                                        "doc_id long, text string"))
        ep.upsert(spark.createDataFrame([(0, "")],
                                        "doc_id long, text string"))
        probe = spark.createDataFrame([(9, BASE)],
                                      "doc_id long, text string")
        assert ep.screen(probe, threshold=0.5).count() == 0

    def test_layout_is_part_of_the_identity(self, spark, tmp_path):
        path = str(tmp_path / "e")
        ep = _mh(spark, path, layout="epoch")
        ep.commit(spark.createDataFrame([(0, BASE)],
                                        "doc_id long, text string"))
        with pytest.raises(ValueError, match="created with"):
            _mh(spark, path)              # flat reopen refused
        with pytest.raises(ValueError, match="layout"):
            _mh(spark, str(tmp_path / "x"), layout="zorder")
        with pytest.raises(ValueError, match="mutually"):
            _mh(spark, str(tmp_path / "y"), layout="epoch",
                bucketed_table="t_nope")

    def test_epoch_layout_on_other_stores(self, spark, tmp_path):
        mk = lambda rows: spark.createDataFrame(rows, "id long, fp long")
        fp = FingerprintStore(spark, str(tmp_path / "fp"), bits=32,
                              max_hamming=3, layout="epoch")
        fp.commit(mk([(0, 0xDEADBEEF)]))
        fp.upsert(mk([(0, 0x12345678)]))
        assert [(r["new_id"], r["known_id"]) for r in
                fp.screen(mk([(9, 0x12345678)])).collect()] == [(9, 0)]
        assert fp.screen(mk([(8, 0xDEADBEEF)])).count() == 0
        dim = 8
        v = [1.0] + [0.0] * (dim - 1)
        w = [0.0] * (dim - 1) + [1.0]
        mkv = lambda rows: spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        es = EmbeddingStore(spark, str(tmp_path / "es"), dim=dim,
                            tables=2, bits=2, layout="epoch")
        es.commit(mkv([(0, w)]))
        es.upsert(mkv([(0, v)]))
        assert [(r["new_id"], r["known_id"]) for r in
                es.screen(mkv([(9, v)]), threshold=0.9).collect()] \
            == [(9, 0)]
        assert es.screen(mkv([(8, w)]), threshold=0.9).count() == 0
        # bounded compact holds screen parity on BOTH stores (the
        # base-class path all three stores share) and clears tombstones
        import os

        fp.compact()
        es.compact()
        assert not os.path.isdir(str(tmp_path / "fp" / "tombstones"))
        assert not os.path.isdir(str(tmp_path / "es" / "tombstones"))
        assert [(r["new_id"], r["known_id"]) for r in
                fp.screen(mk([(9, 0x12345678)])).collect()] == [(9, 0)]
        assert fp.screen(mk([(8, 0xDEADBEEF)])).count() == 0
        assert [(r["new_id"], r["known_id"]) for r in
                es.screen(mkv([(9, v)]), threshold=0.9).collect()] \
            == [(9, 0)]
        assert es.screen(mkv([(8, w)]), threshold=0.9).count() == 0


class TestRandomizedModelParity:
    @pytest.mark.parametrize("seed", [7, 23, 91])
    def test_epoch_store_matches_rebuilt_flat_store(self, spark,
                                                    tmp_path, seed):
        """Model-based randomized pin: after ANY sequence of
        commit/upsert/compact on an epoch store, its screens must
        equal a FRESH flat store committed with exactly the model's
        final contents — the strongest single statement of the
        layout's resolution semantics."""
        import random

        rng = random.Random(seed)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

        def text():
            return " ".join(rng.choice(words) for _ in range(12))

        ep = _mh(spark, str(tmp_path / f"e{seed}"), layout="epoch")
        model: dict[int, str] = {}
        next_id = 0
        for step in range(6):
            op = rng.choice(["commit", "upsert", "upsert", "compact"])
            if op == "commit":
                batch = [(next_id + i, text()) for i in range(2)]
                next_id += 2
                for i, t in batch:
                    model[i] = t
                ep.commit(spark.createDataFrame(
                    batch, "doc_id long, text string"))
            elif op == "upsert" and model:
                ids = rng.sample(sorted(model), k=min(2, len(model)))
                batch = [(i, text()) for i in ids]
                for i, t in batch:
                    model[i] = t
                ep.upsert(spark.createDataFrame(
                    batch, "doc_id long, text string"))
            elif op == "compact":
                # both maintenance modes fuzz the same model: bounded
                # (manifest-pruned fold) and full (whole-state rewrite)
                ep.compact(full=rng.random() < 0.5)
        if not model:
            return
        ref = _mh(spark, str(tmp_path / f"r{seed}"))
        ref.commit(spark.createDataFrame(sorted(model.items()),
                                         "doc_id long, text string"))
        probes = spark.createDataFrame(
            [(1000 + i, t) for i, t in enumerate(model.values())],
            "doc_id long, text string")
        got = sorted(map(tuple,
                         ep.screen(probes, threshold=0.5).collect()))
        want = sorted(map(tuple,
                          ref.screen(probes, threshold=0.5).collect()))
        assert got == want and want


class TestForeignTableGuard:
    """The path meta records WHICH bucketed table the store's state
    lives in (r10 advice): a crash-recovery re-stamp may only claim a
    property-less table the path meta proves ownership of — an old
    path meta from a DIFFERENT table (or from flat mode) must refuse,
    not silently ALTER the foreign table and append to it."""

    def test_path_meta_from_another_table_cannot_claim(self, spark,
                                                       tmp_path):
        path = str(tmp_path / "own")
        mine = _mh(spark, path, bucketed_table="t_mh_guard_a",
                   n_buckets=8)
        try:
            mine.commit(spark.createDataFrame(
                [(0, BASE)], "doc_id long, text string"))
            # an unrelated property-less table pre-exists
            spark.sql("DROP TABLE IF EXISTS t_mh_guard_b")
            spark.createDataFrame([(1,)], "x long").write \
                .saveAsTable("t_mh_guard_b")
            # same path, other table: the identity mismatch refuses
            # BEFORE any re-stamp could touch t_mh_guard_b
            with pytest.raises(ValueError, match="created with"):
                _mh(spark, path, bucketed_table="t_mh_guard_b",
                    n_buckets=8)
            props = {r["key"] for r in spark.sql(
                "SHOW TBLPROPERTIES t_mh_guard_b").collect()}
            assert mine._META_PROP not in props
            # and a bucketed store's path cannot reopen as flat (its
            # path state dir is empty -> screens would vacuously pass)
            with pytest.raises(ValueError, match="created with"):
                _mh(spark, path)
        finally:
            spark.sql("DROP TABLE IF EXISTS t_mh_guard_a")
            spark.sql("DROP TABLE IF EXISTS t_mh_guard_b")


class TestCompactAndMetaBackCompat:
    def test_no_tombstone_compact_keeps_full_clean_contract(
            self, spark, tmp_path):
        """An append-only epoch store (no tombstones) calling plain
        compact() must still get the pre-bounded contract: replayed
        commit rows collapse and epochs fold to one (review catch —
        a silent no-op here would leave callers believing their
        documented maintenance step ran)."""
        import os

        ep = _mh(spark, str(tmp_path / "e"), layout="epoch")
        batch = spark.createDataFrame([(0, BASE)],
                                      "doc_id long, text string")
        ep.commit(batch)
        ep.commit(batch)   # replay
        assert ep.state().count() == 2 * ep.state().distinct().count()
        ep.compact()
        assert ep.state().count() == ep.state().distinct().count()
        active = ep._active_state_name()
        subdirs = [d for d in os.listdir(str(tmp_path / "e" / active))
                   if d.startswith("epoch=")]
        assert len(subdirs) == 1

    def test_legacy_meta_without_table_binding_migrates(self, spark,
                                                        tmp_path):
        """A bucketed store persisted before bucketed_table joined the
        identity (its meta lacks the key) must reopen with the original
        parameters — and the open MIGRATES the meta so the foreign-
        table guard holds from then on (review catch: raising here
        would brick every pre-upgrade store)."""
        import json

        import pyarrow as pa
        import pyarrow.parquet as papq

        path = str(tmp_path / "b")
        store = _mh(spark, path, bucketed_table="t_mh_legacy_meta",
                    n_buckets=8)
        try:
            store.commit(spark.createDataFrame(
                [(0, BASE)], "doc_id long, text string"))
            # simulate the pre-upgrade meta: same parameters, no
            # bucketed_table key
            legacy = dict(store._meta_dict())
            papq.write_table(
                pa.table({"meta": [json.dumps(legacy)]}),
                str(tmp_path / "b" / "meta" / "meta-0.parquet"))
            reopened = _mh(spark, path,
                           bucketed_table="t_mh_legacy_meta",
                           n_buckets=8)
            assert reopened._read_meta() == reopened._identity()
            probe = spark.createDataFrame([(9, BASE)],
                                          "doc_id long, text string")
            assert reopened.screen(probe, threshold=0.5).count() == 1
            # wrong table name against the legacy-migrated meta refuses
            with pytest.raises(ValueError, match="created with"):
                _mh(spark, path, bucketed_table="t_mh_other",
                    n_buckets=8)
            # ...and a legacy (pre-migration) meta refuses to bind a
            # name the table side cannot corroborate — a typo'd first
            # post-upgrade open must not become the authoritative
            # binding (review catch)
            legacy = dict(store._meta_dict())
            papq.write_table(
                pa.table({"meta": [json.dumps(legacy)]}),
                str(tmp_path / "b" / "meta" / "meta-0.parquet"))
            with pytest.raises(ValueError, match="corroborate"):
                _mh(spark, path, bucketed_table="t_mh_typo",
                    n_buckets=8)
            # the correct name still migrates after the failed attempt
            again = _mh(spark, path, bucketed_table="t_mh_legacy_meta",
                        n_buckets=8)
            assert again._read_meta() == again._identity()
        finally:
            spark.sql("DROP TABLE IF EXISTS t_mh_legacy_meta")

    def test_true_pre_upgrade_store_both_metas_legacy(self, spark,
                                                      tmp_path):
        """A TRUE pre-upgrade store has the legacy dict in BOTH places —
        the path meta AND the table property were stamped by old code
        (no 'bucketed_table' key in either). The migrating open must
        re-stamp both and every later open must succeed (r11 ADVICE:
        migrating only the path meta left the property legacy, so the
        table_meta != mine check raised on the migrating open and on
        every open after it)."""
        import json

        import pyarrow as pa
        import pyarrow.parquet as papq

        path = str(tmp_path / "b")
        store = _mh(spark, path, bucketed_table="t_mh_legacy_both",
                    n_buckets=8)
        try:
            store.commit(spark.createDataFrame(
                [(0, BASE)], "doc_id long, text string"))
            legacy = dict(store._meta_dict())  # no bucketed_table key
            papq.write_table(
                pa.table({"meta": [json.dumps(legacy)]}),
                str(tmp_path / "b" / "meta" / "meta-0.parquet"))
            payload = json.dumps(legacy).replace("'", "''")
            spark.sql(
                "ALTER TABLE t_mh_legacy_both SET TBLPROPERTIES "
                f"('{store._META_PROP}' = '{payload}')")
            # first post-upgrade open: migrates path meta AND property
            reopened = _mh(spark, path,
                           bucketed_table="t_mh_legacy_both",
                           n_buckets=8)
            assert reopened._read_meta() == reopened._identity()
            assert reopened._read_table_meta() == reopened._identity()
            # second open (the other half of the brick: path meta
            # already migrated, property must not still be legacy)
            again = _mh(spark, path, bucketed_table="t_mh_legacy_both",
                        n_buckets=8)
            probe = spark.createDataFrame([(9, BASE)],
                                          "doc_id long, text string")
            assert again.screen(probe, threshold=0.5).count() == 1
        finally:
            spark.sql("DROP TABLE IF EXISTS t_mh_legacy_both")


THIRD = ("distributed training data pipelines require careful corpus "
         "deduplication quality filtering and language identification "
         "before any tokenizer ever sees a single byte of raw text")


class TestExpire:
    def _df(self, spark, doc_id, text):
        return spark.createDataFrame([(doc_id, text)],
                                     "doc_id long, text string")

    def test_sliding_window_forgets_old_epochs(self, spark, tmp_path):
        import os

        store = _mh(spark, str(tmp_path / "e"), layout="epoch")
        store.commit(self._df(spark, 0, BASE))     # epoch 0
        store.commit(self._df(spark, 10, OTHER))   # epoch 1
        store.commit(self._df(spark, 20, THIRD))   # epoch 2
        for probe in (BASE, OTHER, THIRD):
            assert store.screen(self._df(spark, 99, probe),
                                threshold=0.5).count() == 1
        assert store.expire(keep_last=2) == [0]
        # the oldest window is forgotten; the recent two still screen
        assert store.screen(self._df(spark, 99, BASE),
                            threshold=0.5).count() == 0
        for probe in (OTHER, THIRD):
            assert store.screen(self._df(spark, 99, probe),
                                threshold=0.5).count() == 1
        active = store._active_state_name()
        dirs = sorted(os.listdir(str(tmp_path / "e" / active)))
        assert [d for d in dirs if d.startswith("epoch=")] == \
            ["epoch=1", "epoch=2"]
        # a fresh instance sees the swapped pointer
        again = _mh(spark, str(tmp_path / "e"), layout="epoch")
        assert again.screen(self._df(spark, 99, BASE),
                            threshold=0.5).count() == 0
        # commits continue above the kept epochs
        store.commit(self._df(spark, 30, BASE))    # epoch 3
        assert store._epoch_numbers() == [1, 2, 3]
        assert store.screen(self._df(spark, 99, BASE),
                            threshold=0.5).count() == 1

    def test_upto_epoch_form_and_hardlink_carry(self, spark, tmp_path):
        import os

        store = _mh(spark, str(tmp_path / "e"), layout="epoch")
        store.commit(self._df(spark, 0, BASE))
        store.commit(self._df(spark, 10, OTHER))
        root = str(tmp_path / "e")
        before = {
            f: os.stat(os.path.join(root, store._active_state_name(),
                                    "epoch=1", f)).st_ino
            for f in os.listdir(os.path.join(
                root, store._active_state_name(), "epoch=1"))}
        assert store.expire(upto_epoch=0) == [0]
        after_dir = os.path.join(root, store._active_state_name(),
                                 "epoch=1")
        after = {f: os.stat(os.path.join(after_dir, f)).st_ino
                 for f in os.listdir(after_dir)}
        assert before == after   # carried by hardlink, not rewrite
        # nothing qualified -> no-op, pointer unchanged
        name = store._active_state_name()
        assert store.expire(upto_epoch=0) == []
        assert store._active_state_name() == name

    def test_expire_then_compact_with_tombstones(self, spark, tmp_path):
        store = _mh(spark, str(tmp_path / "e"), layout="epoch")
        store.commit(self._df(spark, 0, BASE))     # epoch 0
        store.commit(self._df(spark, 10, OTHER))   # epoch 1
        # tombstone doc 10 via upsert (correction), then expire epoch 0
        store.upsert(self._df(spark, 10, THIRD))   # epoch 2 + tombstone
        assert store.expire(upto_epoch=0) == [0]
        # tombstones survived the expiry and still resolve
        assert store.screen(self._df(spark, 99, OTHER),
                            threshold=0.5).count() == 0
        assert store.screen(self._df(spark, 99, THIRD),
                            threshold=0.5).count() == 1
        store.compact()                            # clears dead weight
        assert store.screen(self._df(spark, 99, THIRD),
                            threshold=0.5).count() == 1
        assert store.screen(self._df(spark, 99, BASE),
                            threshold=0.5).count() == 0

    def test_expire_on_other_stores(self, spark, tmp_path):
        """expire() rides the shared base-class machinery — smoke the
        forget/keep split on the fingerprint and embedding stores."""
        mk = lambda rows: spark.createDataFrame(rows, "id long, fp long")
        fp = FingerprintStore(spark, str(tmp_path / "fp"), bits=32,
                              max_hamming=3, layout="epoch")
        fp.commit(mk([(0, 0xDEADBEEF)]))      # epoch 0
        fp.commit(mk([(1, 0x12345678)]))      # epoch 1
        assert fp.expire(keep_last=1) == [0]
        assert fp.screen(mk([(9, 0xDEADBEEF)])).count() == 0
        assert fp.screen(mk([(9, 0x12345678)])).count() == 1
        dim = 8
        v = [1.0] + [0.0] * (dim - 1)
        w = [0.0] * (dim - 1) + [1.0]
        mkv = lambda rows: spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        es = EmbeddingStore(spark, str(tmp_path / "es"), dim=dim,
                            tables=2, bits=2, layout="epoch")
        es.commit(mkv([(0, w)]))              # epoch 0
        es.commit(mkv([(1, v)]))              # epoch 1
        assert es.expire(upto_epoch=0) == [0]
        assert es.screen(mkv([(9, w)]), threshold=0.9).count() == 0
        assert es.screen(mkv([(9, v)]), threshold=0.9).count() == 1

    def test_expire_errors(self, spark, tmp_path):
        store = _mh(spark, str(tmp_path / "e"), layout="epoch")
        store.commit(self._df(spark, 0, BASE))
        with pytest.raises(ValueError, match="exactly one"):
            store.expire()
        with pytest.raises(ValueError, match="exactly one"):
            store.expire(upto_epoch=0, keep_last=1)
        with pytest.raises(ValueError, match="keep_last"):
            store.expire(keep_last=0)
        with pytest.raises(ValueError, match="every epoch"):
            store.expire(upto_epoch=99)
        flat = _mh(spark, str(tmp_path / "f"))
        flat.commit(self._df(spark, 0, BASE))
        with pytest.raises(NotImplementedError, match="epoch"):
            flat.expire(keep_last=1)


class TestCarryGuards:
    def _df(self, spark, base_id, text):
        return spark.createDataFrame([(base_id, text)],
                                     "doc_id long, text string")

    def test_expire_skips_stray_subdirectory(self, spark, tmp_path):
        """The hardlink carry guards against non-regular-file entries
        (r12 ADVICE): a stray subdirectory inside a kept epoch dir must
        not abort the carry mid-build."""
        import os

        store = _mh(spark, str(tmp_path / "e"), layout="epoch")
        store.commit(self._df(spark, 0, BASE))     # epoch 0
        store.commit(self._df(spark, 10, OTHER))   # epoch 1
        stray = os.path.join(str(tmp_path / "e"),
                             store._active_state_name(), "epoch=1",
                             "_stray_dir")
        os.makedirs(stray)
        assert store.expire(upto_epoch=0) == [0]
        assert store.screen(self._df(spark, 99, OTHER),
                            threshold=0.5).count() == 1
        carried = os.path.join(str(tmp_path / "e"),
                               store._active_state_name(), "epoch=1")
        assert "_stray_dir" not in os.listdir(carried)
