"""SemDeDup (operators/dedup.py:semantic_cell_pairs / semantic_dedup) —
embedding-level near-identical removal via k-means cells.

Semantics pinned here: candidates form only within a k-means cell; every
emitted pair is exactly verified (cos >= threshold, id_a < id_b); the
survivor of each connected component is the min id; survivors keep the
input schema; scale-invariance of cosine (a copy scaled 3x is still a dup).
"""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.dedup import (semantic_cell_pairs,
                                                 semantic_dedup)


@pytest.fixture(scope="module")
def corpus(spark):
    # three orthogonal direction groups in R^4; ids chosen so min-id
    # survivors are unambiguous. 3.0x scaling => cosine-identical.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "a"),
        (1, [3.0, 0.0, 0.0, 0.0], "a-copy-scaled"),
        (2, [1.0, 0.01, 0.0, 0.0], "a-near"),
        (3, [1.0, 0.4, 0.0, 0.0], "a-far"),        # cos ~0.928 < 0.95
        (10, [0.0, 1.0, 0.0, 0.0], "b"),
        (11, [0.0, 2.0, 0.0, 0.0], "b-copy-scaled"),
        (20, [0.0, 0.0, 1.0, 0.0], "c-unique"),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")


def test_pairs_within_cells_only(spark, corpus):
    pairs = semantic_cell_pairs(corpus, threshold=0.95, n_cells=3,
                                seed=7).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2), (10, 11)}
    assert all(r["cos_sim"] >= 0.95 for r in pairs)
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_dedup_keeps_min_id_and_schema(spark, corpus):
    out = semantic_dedup(corpus, threshold=0.95, n_cells=3, seed=7)
    assert out.columns == corpus.columns
    ids = {r["vec_id"] for r in out.select("vec_id").collect()}
    # component {0,1,2} -> 0 survives; {10,11} -> 10; 3 and 20 untouched
    assert ids == {0, 3, 10, 20}


def test_no_surviving_near_identical_pair(spark, corpus):
    """Post-condition: among survivors, no pair that shared a cell still
    has cos >= threshold (exact check on the tiny set)."""
    out = semantic_dedup(corpus, threshold=0.95, n_cells=3, seed=7)
    from faisssearcher_spark.operators.dedup import embedding_cosine_pairs
    left = embedding_cosine_pairs(out, id_col="vec_id",
                                  strategy="catalyst",
                                  threshold=0.95).count()
    assert left == 0


def test_real_corpus_partition_invariants(embeddings):
    """On the driver testdata: survivors + losers == corpus, every loser
    appeared in at least one candidate pair, and the pair stage emits
    only verified pairs."""
    total = embeddings.count()
    thr, cells = 0.30, 8   # isotropic synthetic corpus: ~p99 within-cell cos
    pairs = semantic_cell_pairs(embeddings, threshold=thr, n_cells=cells,
                                seed=42)
    out = semantic_dedup(embeddings, threshold=thr, n_cells=cells,
                         seed=42)
    n_out = out.count()
    paired_ids = pairs.select(F.col("id_a").alias("vec_id")).union(
        pairs.select(F.col("id_b").alias("vec_id"))).distinct()
    n_paired = paired_ids.count()
    assert n_out < total            # something was removed...
    assert total - n_out < n_paired or n_paired == 0
    # ...and every removed id was a member of some candidate pair
    removed = embeddings.join(out.select("vec_id"), "vec_id", "left_anti")
    orphans = removed.join(paired_ids, "vec_id", "left_anti").count()
    assert orphans == 0
