"""Matryoshka prefix truncation + two-stage search
(functions/vector.mrl_truncate, operators/ann.mrl_rerank_topk)."""

import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.functions.vector import mrl_truncate
from faisssearcher_spark.operators.ann import mrl_rerank_topk
from faisssearcher_spark.operators.knn import knn_join


class TestMrlTruncate:
    def test_prefix_and_unit_norm(self, embeddings):
        rows = embeddings.limit(10).select(
            "embedding",
            mrl_truncate("embedding", 16).alias("m"),
            mrl_truncate("embedding", 16, renormalize=False).alias("raw"),
        ).collect()
        for r in rows:
            assert len(r["m"]) == 16 and len(r["raw"]) == 16
            # raw is the literal prefix
            for a, b in zip(r["raw"], r["embedding"][:16]):
                assert a == pytest.approx(float(b), abs=1e-7)
            # renormalized prefix is unit and direction-preserving
            assert math.hypot(*r["m"]) == pytest.approx(1.0, abs=1e-9)
            nrm = math.sqrt(sum(x * x for x in r["raw"]))
            for a, b in zip(r["m"], r["raw"]):
                assert a == pytest.approx(b / nrm, abs=1e-12)

    def test_dims_validated(self, embeddings):
        with pytest.raises(ValueError, match="dims"):
            mrl_truncate("embedding", 0)


@pytest.fixture(scope="module")
def queries(embeddings):
    return embeddings.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("qid"), "embedding")


class TestMrlRerank:
    def test_survivor_scores_exact(self, queries, embeddings):
        """Whatever the prefix shortlist admits, the reported sim_val is
        the full-width exact cosine (the _exact_rescore contract)."""
        exact = {(r["source_item"], r["sim_item"]): r["sim_val"]
                 for r in knn_join(
                     queries, embeddings, metric="cos", k=50,
                     query_item_col="qid", item_key_col="vec_id",
                     payload_cols=[]).collect()}
        got = mrl_rerank_topk(queries, embeddings, k=5, dims=32,
                              factor=4, query_item_col="qid",
                              item_key_col="vec_id").collect()
        for r in got:
            key = (r["source_item"], r["sim_item"])
            if key in exact:   # top-50 covers every realistic survivor
                assert r["sim_val"] == pytest.approx(exact[key],
                                                     abs=1e-9)

    def test_recall_floor_and_dims_monotonicity(self, queries,
                                                embeddings):
        exact = {(r["source_item"], r["sim_item"])
                 for r in knn_join(
                     queries, embeddings, metric="cos", k=10,
                     query_item_col="qid", item_key_col="vec_id",
                     payload_cols=[]).collect()}

        def recall(dims):
            got = {(r["source_item"], r["sim_item"])
                   for r in mrl_rerank_topk(
                       queries, embeddings, k=10, dims=dims, factor=8,
                       query_item_col="qid",
                       item_key_col="vec_id").collect()}
            return len(got & exact) / len(exact)

        r32 = recall(32)
        # isotropic vectors are MRL's worst case — even there the
        # half-width prefix with factor 8 must recover most of top-10
        assert r32 >= 0.6
        # full-width prefix is brute force: recall exactly 1
        assert recall(64) == 1.0

    def test_rank_contract_and_validation(self, queries, embeddings):
        out = mrl_rerank_topk(queries, embeddings, k=3, dims=16,
                              query_item_col="qid",
                              item_key_col="vec_id").collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["source_item"], []).append(r)
        for rows in per_q.values():
            rows.sort(key=lambda r: r["rank_no"])
            assert [r["rank_no"] for r in rows] == list(range(len(rows)))
            vals = [r["sim_val"] for r in rows]
            assert vals == sorted(vals, reverse=True)
        with pytest.raises(ValueError):
            mrl_rerank_topk(queries, embeddings, k=0,
                            query_item_col="qid", item_key_col="vec_id")

    def test_non_cos_metric_rejected(self, queries, embeddings):
        """The prefix shortlist ranks by direction only — dot/l2 on an
        unnormalized corpus could silently collapse recall, so the
        operator refuses rather than degrades."""
        with pytest.raises(ValueError, match="cos"):
            mrl_rerank_topk(queries, embeddings, k=3, metric="dot",
                            query_item_col="qid", item_key_col="vec_id")
