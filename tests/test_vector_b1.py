"""1-bit sign embedding codec (functions/vector.py): packing layout vs
numpy, Hamming distance, cosine estimate, and the prefilter+rerank search
(operators/ann.b1_rerank_topk)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.functions.vector import (b1_cosine_estimate,
                                                  b1_hamming, quantize_b1)


def _pack_np(v):
    """Reference packing: bit j of word w set iff v[32w+j] >= 0."""
    words = []
    for w in range((len(v) + 31) // 32):
        acc = 0
        for j, x in enumerate(v[w * 32:(w + 1) * 32]):
            if x >= 0:
                acc |= 1 << j
        words.append(acc)
    return words


@pytest.fixture(scope="module")
def frame(spark):
    rng = np.random.default_rng(5)
    rows = [(i, rng.standard_normal(70).tolist()) for i in range(6)]
    rows += [(6, [0.0, -0.0, 1.0, -1.0]),      # signed-zero edge
             (7, [1.0] * 32),                  # exactly one full word
             (8, []),                          # empty vector
             (9, None)]                        # NULL vector
    return spark.createDataFrame(rows, "id long, v array<double>")


class TestPacking:
    def test_matches_numpy_reference(self, frame):
        out = {r["id"]: (r["v"], r["c"]) for r in frame.select(
            "id", "v", quantize_b1("v").alias("c")).collect()}
        for i in range(8):
            v, c = out[i]
            assert c == _pack_np(v), f"row {i}"

    def test_word_values_unsigned_range(self, frame):
        rows = frame.filter("v is not null and size(v) > 0").select(
            quantize_b1("v").alias("c")).collect()
        for r in rows:
            assert all(0 <= w < 2 ** 32 for w in r["c"])

    def test_negative_zero_reads_positive(self, spark):
        r = spark.createDataFrame([([0.0, -0.0],)], "v array<double>") \
            .select(quantize_b1("v").alias("c")).first()
        assert r["c"] == [3]

    def test_empty_and_null(self, frame):
        got = {r["id"]: r["c"] for r in frame.filter("id >= 8").select(
            "id", quantize_b1("v").alias("c")).collect()}
        assert got[8] == []
        assert got[9] is None

    def test_tail_word_partial(self, spark):
        # 33 dims: second word holds exactly one bit
        v = [-1.0] * 32 + [1.0]
        r = spark.createDataFrame([(v,)], "v array<double>") \
            .select(quantize_b1("v").alias("c")).first()
        assert r["c"] == [0, 1]


class TestHamming:
    def test_matches_popcount(self, spark):
        rng = np.random.default_rng(9)
        a = rng.standard_normal(70)
        b = rng.standard_normal(70)
        expected = sum(int(x >= 0) != int(y >= 0) for x, y in zip(a, b))
        r = spark.createDataFrame([(a.tolist(), b.tolist())],
                                  "a array<double>, b array<double>") \
            .select(b1_hamming(quantize_b1("a"), quantize_b1("b"))
                    .alias("h")).first()
        assert r["h"] == expected

    def test_self_distance_zero(self, frame):
        rows = frame.filter("v is not null").select(
            b1_hamming(quantize_b1("v"), quantize_b1("v")).alias("h")
        ).collect()
        assert all(r["h"] == 0 for r in rows)

    def test_cosine_estimate_identity_and_negation(self, spark):
        v = np.random.default_rng(1).standard_normal(64)
        df = spark.createDataFrame(
            [(v.tolist(), v.tolist(), (-v).tolist())],
            "a array<double>, b array<double>, c array<double>")
        r = df.select(
            b1_cosine_estimate(quantize_b1("a"), quantize_b1("b"), 64)
            .alias("same"),
            b1_cosine_estimate(quantize_b1("a"), quantize_b1("c"), 64)
            .alias("neg")).first()
        assert r["same"] == pytest.approx(1.0)
        assert r["neg"] == pytest.approx(-1.0)

    def test_cosine_estimate_tracks_angle(self, spark):
        # isotropic pairs: estimate within 0.35 of true cosine (coarse —
        # d=64 sign bits carry ~1/sqrt(64) resolution)
        rng = np.random.default_rng(17)
        rows = []
        for _ in range(50):
            a = rng.standard_normal(64)
            b = 0.7 * a + 0.7 * rng.standard_normal(64)
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            rows.append((a.tolist(), b.tolist(), cos))
        df = spark.createDataFrame(rows,
                                   "a array<double>, b array<double>, "
                                   "cos double")
        got = df.select(
            "cos",
            b1_cosine_estimate(quantize_b1("a"), quantize_b1("b"), 64)
            .alias("est")).collect()
        err = [abs(r["cos"] - r["est"]) for r in got]
        assert max(err) < 0.45 and sum(err) / len(err) < 0.2


class TestB1RerankTopk:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rng = np.random.default_rng(23)
        items = [(i, rng.standard_normal(64).tolist()) for i in range(400)]
        return spark.createDataFrame(items, "item long, embedding array<double>")

    def test_recall_and_exact_scores(self, spark, corpus):
        from faisssearcher_spark.operators.ann import b1_rerank_topk
        from faisssearcher_spark.operators.knn import knn_join

        queries = corpus.filter("item < 8").select(
            F.col("item").alias("query_id"), "embedding")
        approx = b1_rerank_topk(queries, corpus, k=5, factor=8).collect()
        exact = knn_join(queries, corpus, k=5, metric="cos",
                         query_item_col="query_id",
                         item_key_col="item").collect()
        ap = {(r["source_item"], r["sim_item"]): r["sim_val"] for r in approx}
        ex = {(r["source_item"], r["sim_item"]): r["sim_val"] for r in exact}
        # survivor scores are EXACT (rerank uses the float vectors)
        for key in set(ap) & set(ex):
            assert ap[key] == pytest.approx(ex[key], abs=1e-9)
        # recall across 8 queries x top5: sign prefilter at factor 8
        # keeps most true neighbors (self-match always survives: ham 0)
        hits = len(set(ap) & set(ex))
        assert hits / len(ex) >= 0.6
        for q in range(8):
            assert ap.get((q, q)) == pytest.approx(1.0)

    def test_shortlist_size_bounds_output(self, corpus):
        from faisssearcher_spark.operators.ann import b1_rerank_topk
        queries = corpus.filter("item < 2").select(
            F.col("item").alias("query_id"), "embedding")
        out = b1_rerank_topk(queries, corpus, k=3, factor=1).toPandas()
        assert sorted(out.groupby("source_item").size()) == [3, 3]
        assert sorted(out["rank_no"].unique()) == [0, 1, 2]

    def test_validates_params(self, corpus):
        from faisssearcher_spark.operators.ann import b1_rerank_topk
        with pytest.raises(ValueError, match="factor"):
            b1_rerank_topk(corpus, corpus, k=0)
