"""JL random projection (operators/projection.py) and PQ refine
(PQIndex.search(refine_factor=...))."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators import projection


class TestRandomProjection:
    @pytest.fixture(scope="class")
    def frame(self, spark):
        rng = np.random.default_rng(3)
        mat = rng.standard_normal((60, 128))
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(mat)],
            "vec_id long, embedding array<float>"), mat

    def test_deterministic_and_matches_numpy(self, frame):
        df, mat = frame
        out = {r["vec_id"]: np.array(r["proj"]) for r in
               projection.random_projection(
                   df, out_dim=16, seed=7, out_col="proj").collect()}
        r = projection.projection_matrix(128, 16, seed=7)
        want = mat @ r
        for i in range(60):
            assert out[i] == pytest.approx(want[i], rel=1e-5, abs=1e-5)

    def test_pairwise_distances_roughly_preserved(self, frame):
        df, mat = frame
        out = projection.random_projection(df, out_dim=64, seed=0,
                                           out_col="proj") \
            .orderBy("vec_id").collect()
        proj = np.array([r["proj"] for r in out])
        rng = np.random.default_rng(0)
        # sample pairs; JL: squared distances within ~±0.6 at out_dim 64
        ratios = []
        for _ in range(200):
            i, j = rng.integers(0, 60, 2)
            if i == j:
                continue
            d_orig = ((mat[i] - mat[j]) ** 2).sum()
            d_proj = ((proj[i] - proj[j]) ** 2).sum()
            ratios.append(d_proj / d_orig)
        ratios = np.array(ratios)
        assert 0.9 < ratios.mean() < 1.1     # unbiased
        assert (np.abs(ratios - 1) < 0.6).mean() > 0.95

    def test_sparse_variant_and_validation(self, frame):
        df, mat = frame
        out = projection.random_projection(df, out_dim=16, seed=1,
                                           density=0.1, out_col="p").first()
        assert len(out["p"]) == 16
        with pytest.raises(ValueError, match="must be <"):
            projection.projection_matrix(8, 8)
        with pytest.raises(ValueError, match="density"):
            projection.projection_matrix(8, 4, density=0)

    def test_separate_frames_share_space(self, spark):
        """Queries and items projected independently with the same seed
        must land in the same space (same matrix)."""
        v = [float(x) for x in range(32)]
        a = spark.createDataFrame([(0, v)], "id long, embedding array<float>")
        b = spark.createDataFrame([(1, v)], "id long, embedding array<float>")
        pa = projection.random_projection(a, out_dim=8, seed=5).first()
        pb = projection.random_projection(b, out_dim=8, seed=5).first()
        assert pa["embedding"] == pytest.approx(pb["embedding"])


class TestPqRefine:
    def test_refine_improves_recall_with_exact_scores(self, spark, embeddings):
        from faisssearcher_spark.operators.ann import PQIndex
        from faisssearcher_spark.operators.knn import knn_join

        corpus = embeddings.limit(400)
        queries = corpus.limit(15).select(
            F.col("vec_id").alias("query_id"), "embedding")
        exact = knn_join(queries, corpus, metric="cos", k=5,
                         query_item_col="query_id", item_key_col="vec_id",
                         payload_cols=[])
        truth = {(r["source_item"], r["sim_item"]): r["sim_val"]
                 for r in exact.collect()}

        idx = PQIndex(m=8, seed=42, metric="cos").fit(
            corpus, item_key_col="vec_id", item_vec_col="embedding")
        plain = {(r["source_item"], r["sim_item"])
                 for r in idx.search(queries, k=5,
                                     query_item_col="query_id").collect()}
        refined = idx.search(queries, k=5, query_item_col="query_id",
                             refine_factor=8)
        ref = {(r["source_item"], r["sim_item"]): r["sim_val"]
               for r in refined.collect()}
        rec_plain = len(plain & set(truth)) / len(truth)
        rec_ref = len(set(ref) & set(truth)) / len(truth)
        assert rec_ref >= rec_plain          # refine never hurts recall
        # survivors that ARE true neighbours carry EXACT cosine scores
        both = set(ref) & set(truth)
        assert both
        for key in both:
            assert ref[key] == pytest.approx(truth[key], abs=1e-9)

    def test_refine_factor_validation(self, spark, embeddings):
        from faisssearcher_spark.operators.ann import PQIndex
        idx = PQIndex(m=8).fit(embeddings.limit(50),
                               item_key_col="vec_id",
                               item_vec_col="embedding")
        q = embeddings.limit(2).select(F.col("vec_id").alias("query_id"),
                                       "embedding")
        with pytest.raises(ValueError, match="refine_factor"):
            idx.search(q, k=3, query_item_col="query_id", refine_factor=0)
