"""Scale-sweep corpus synthesis invariants (faisssearcher_spark/scalebench.py).

The sweep's measurements are only meaningful if the synthetic N× corpora
preserve the base corpus's *statistics per row* while keeping replicas
mutually dissimilar (so candidate/pair output grows linearly, not
quadratically in replica cliques). These tests pin exactly that.
"""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.scalebench import (scaled_documents,
                                            scaled_embeddings)


@pytest.fixture(scope="module")
def emb3(embeddings):
    return scaled_embeddings(embeddings, 3).cache()


@pytest.fixture(scope="module")
def docs2(documents):
    return scaled_documents(documents, 2).cache()


def test_embeddings_row_count_and_id_space(embeddings, emb3):
    n = embeddings.count()
    assert emb3.count() == 3 * n
    assert emb3.select("vec_id").distinct().count() == 3 * n


def test_embeddings_replica_zero_is_identity(embeddings, emb3):
    base = {r["vec_id"]: r["embedding"]
            for r in embeddings.select("vec_id", "embedding").collect()}
    rep0 = emb3.filter(F.col("vec_id") % 3 == 0) \
        .select((F.col("vec_id") / 3).cast("long").alias("vec_id"),
                "embedding").collect()
    assert len(rep0) == len(base)
    for r in rep0:
        assert r["embedding"] == base[r["vec_id"]]


def test_embeddings_replicas_sign_flip_only(embeddings, emb3):
    # every replica's coordinates are ±base coordinate (norms preserved,
    # direction randomized); EVEN replicas must actually flip (odd
    # replicas are planted near-dups of their even sibling and may
    # legitimately be exact duplicates when no low-mass coordinate
    # drew a flip)
    base = {r["vec_id"]: r["embedding"]
            for r in embeddings.select("vec_id", "embedding").collect()}
    reps = emb3.filter(F.col("vec_id") % 3 != 0).limit(50).collect()
    for r in reps:
        bvec = base[r["vec_id"] // 3]
        vec = r["embedding"]
        assert len(vec) == len(bvec)
        assert all(abs(a) == abs(b) for a, b in zip(vec, bvec))
        if (r["vec_id"] % 3) % 2 == 0:
            assert any(a != b for a, b in zip(vec, bvec))


def test_embeddings_planted_near_dup_pairs(embeddings):
    """Even/odd replicas are planted near-duplicates (cos ≈ 0.87) while
    even/even replicas stay mutually random (cos ≈ 0 ± 1/√d) — the
    linear-pair-growth structure the LSH sweep's verify join measures
    (r5 verdict #3: the x10 leg verified zero candidates)."""
    import numpy as np

    emb4 = scaled_embeddings(embeddings, 4)
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb4.filter(F.col("vec_id") < 4 * 20).collect()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    planted = [cos(rows[b * 4 + r], rows[b * 4 + r + 1])
               for b in range(20) for r in (0, 2)]
    cross = [cos(rows[b * 4], rows[b * 4 + 2]) for b in range(20)]
    assert min(planted) > 0.6          # ≥ 1 − k/32 by the mass bound
    assert sum(c > 0.8 for c in planted) >= 0.6 * len(planted)
    assert max(abs(c) for c in cross) < 0.7


def test_embeddings_deterministic(embeddings, emb3):
    again = scaled_embeddings(embeddings, 3)
    assert emb3.exceptAll(again).count() == 0
    assert again.exceptAll(emb3).count() == 0


def test_documents_row_count_and_token_stats(documents, docs2):
    n = documents.count()
    assert docs2.count() == 2 * n
    # token counts are preserved per replica (shingle-set sizes too)
    base_tok = documents.select(
        F.col("doc_id"), F.size(F.split("text", r"\s+")).alias("nt"))
    rep_tok = docs2.select(
        (F.col("doc_id") / 2).cast("long").alias("doc_id"),
        F.size(F.split("text", r"\s+")).alias("nt"))
    joined = base_tok.alias("b").join(rep_tok.alias("r"), "doc_id") \
        .filter(F.col("b.nt") != F.col("r.nt"))
    assert joined.count() == 0


def test_documents_no_cross_replica_token_collisions(documents, docs2):
    # replica 1 of a doc shares NO token with its replica 0 (so shingle
    # buckets/posting lists grow linearly — no manufactured dup cliques)
    pairs = docs2.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") / 2).cast("long").alias("k"),
        F.split("text", r"\s+").alias("t0")) \
        .join(docs2.filter(F.col("doc_id") % 2 == 1).select(
            ((F.col("doc_id") - 1) / 2).cast("long").alias("k"),
            F.split("text", r"\s+").alias("t1")), "k") \
        .select(F.size(F.array_intersect("t0", "t1")).alias("common"))
    assert pairs.filter(F.col("common") > 0).count() == 0


def test_hamming_planted_pairs_grow_linearly(documents, docs2):
    """The hamming_pairs sweep leg's planted corpus: one verified pair
    (hamming 2) per consecutive id pair, so pair output is exactly n/2
    at every scale point — the linearity evidence for the maximal-width
    banding (r6 verdict #1/#8)."""
    from faisssearcher_spark.scalebench import _hamming_planted

    n = documents.count()
    p1 = _hamming_planted(documents)
    assert p1.count() == n // 2
    assert p1.filter(F.col("hamming") != 2).count() == 0
    assert _hamming_planted(docs2).count() == (2 * n) // 2


def test_bitext_planted_mines_every_twin(embeddings, emb3):
    """The mine_bitext sweep leg (r7 verdict #6, serving shape): src is
    the FIXED base corpus, tgt the scaled corpus under offset ids —
    every src mines a cos=1 twin, so mined rows == |base corpus| at
    every scale point while the tgt side (and the candidate volume)
    grows with the sweep."""
    from faisssearcher_spark.scalebench import _bitext_planted

    n = embeddings.count()
    p1 = _bitext_planted(embeddings, 1)
    assert p1.count() == n
    # the planted twin (offset id) outranks every hub for most sources;
    # exact-duplicate corpus vectors can tie it, so pin a strong majority
    twin = p1.filter(F.col("tgt_id") == F.col("src_id") + 10_000_000)
    assert twin.count() >= int(0.9 * n)
    # scaled: src = replica-0 rows only, still one mined row each
    assert _bitext_planted(emb3, 3).count() == n


def test_skew_join_legs_answer_invariant(documents):
    """The skew sweep legs (r7 NOTES lead #5): plain and salted joins
    over the 30%-hot-key fact must produce identical per-key aggregates
    — salting is shuffle layout, never answers — and the hot key must
    actually carry ~30% of the fact rows (the construction the published
    scaling numbers price)."""
    from faisssearcher_spark.scalebench import _skew_join

    plain = _skew_join(documents, salted=False, reps=5).orderBy("k")
    salted = _skew_join(documents, salted=True, reps=5).orderBy("k")
    p, s = plain.collect(), salted.collect()
    assert p == s and len(p) > 1
    n_docs = documents.count()
    hot = next(r for r in p if r["k"] == 0)
    frac = hot["n_rows"] / (n_docs * 5)
    assert 0.2 <= frac <= 0.4, frac
