"""MaxSim late-interaction rerank (operators/maxsim.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.encoders.mock import HashingEncoder
from faisssearcher_spark.operators.maxsim import maxsim_rerank, maxsim_score
from faisssearcher_spark.plans import inspect


def _ref_maxsim(enc: HashingEncoder, q: str, d: str) -> float:
    """Driver-side numpy reference: sum over distinct query tokens of the
    max cosine against the doc's distinct token vectors."""
    qt = sorted({t for t in str(q).split() if t})
    dt = sorted({t for t in str(d).split() if t})
    if not qt or not dt:
        return 0.0

    def v(t):
        x = enc._token_vec(t)
        return x / np.linalg.norm(x)

    return sum(max(float(v(t) @ v(u)) for u in dt) for t in qt)


@pytest.fixture(scope="module")
def candidates(spark, documents):
    """A realistic first-stage shape: 4 query texts × the 6 lowest-id
    docs as candidates, plus a payload column that must survive."""
    q = documents.filter(F.col("doc_id") < 4).select(
        F.col("text").alias("source_item"))
    c = documents.filter(F.col("doc_id") < 6).select(
        F.col("text").alias("sim_item"), "lang")
    return q.crossJoin(c)


class TestMaxsimScore:
    def test_matches_numpy_reference(self, candidates):
        enc = HashingEncoder(dim=8)
        rows = maxsim_score(candidates).collect()
        assert rows
        for r in rows:
            want = _ref_maxsim(enc, r["source_item"], r["sim_item"])
            assert r["maxsim_score"] == pytest.approx(want, abs=1e-9)

    def test_extra_columns_survive(self, candidates):
        out = maxsim_score(candidates)
        assert set(out.columns) == {"source_item", "sim_item", "lang",
                                    "maxsim_score"}

    def test_empty_sides_score_zero(self, spark):
        cands = spark.createDataFrame(
            [("a b", ""), ("a b", "   "), ("", "a b"), ("a b", "a b")],
            "source_item string, sim_item string")
        got = {(r["source_item"], r["sim_item"]): r["maxsim_score"]
               for r in maxsim_score(cands).collect()}
        assert got[("a b", "")] == 0.0
        assert got[("a b", "   ")] == 0.0
        assert got[("", "a b")] == 0.0
        # identical token sets: every query token matches itself at cos 1
        assert got[("a b", "a b")] == pytest.approx(2.0, abs=1e-9)

    def test_exact_match_scores_token_count(self, spark):
        cands = spark.createDataFrame(
            [("x y z x", "z y x")],   # distinct-token semantics
            "source_item string, sim_item string")
        r = maxsim_score(cands).first()
        assert r["maxsim_score"] == pytest.approx(3.0, abs=1e-9)

    def test_superset_doc_never_hurts(self, spark):
        """Adding doc tokens can only keep or raise each per-query-token
        max — the late-interaction property pooled cosine lacks."""
        cands = spark.createDataFrame(
            [("alpha beta", "alpha beta"),
             ("alpha beta", "alpha beta noise1 noise2 noise3")],
            "source_item string, sim_item string")
        got = {r["sim_item"]: r["maxsim_score"]
               for r in maxsim_score(cands).collect()}
        assert got["alpha beta noise1 noise2 noise3"] >= \
            got["alpha beta"] - 1e-12


class TestMaxsimRerank:
    def test_k_cut_and_rank(self, candidates):
        out = maxsim_rerank(candidates, k=2).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["source_item"], []).append(r)
        for q, rows in per_q.items():
            assert len(rows) == 2
            rows.sort(key=lambda r: r["rank_no"])
            assert [r["rank_no"] for r in rows] == [0, 1]
            assert rows[0]["maxsim_score"] >= rows[1]["maxsim_score"]

    def test_self_candidate_ranks_first(self, candidates):
        """Each query IS one of its candidates (doc_id<4 ⊂ doc_id<6) and
        an identical text maximizes every per-token max."""
        out = maxsim_rerank(candidates, k=1).collect()
        for r in out:
            assert r["sim_item"] == r["source_item"]

    def test_score_scale_rounds(self, candidates):
        out = maxsim_rerank(candidates, k=2, score_scale=4).collect()
        for r in out:
            assert r["maxsim_score"] == round(r["maxsim_score"], 4)

    def test_partition_cols_split_duplicate_query_texts(self, spark):
        """Two query IDs sharing one text must each keep their own
        k-cut when ranking partitions on the ID (the review finding:
        a text-partitioned window merges their candidate pools)."""
        rows = [(qid, "shared query text", cand)
                for qid in (1, 2)
                for cand in ("alpha beta", "alpha gamma", "delta")]
        cands = spark.createDataFrame(
            rows, "qid long, q_text string, cand string")
        out = maxsim_rerank(cands, query_col="q_text", cand_col="cand",
                            k=2, partition_cols=["qid"]).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["qid"], []).append(r["rank_no"])
        assert sorted(per_q) == [1, 2]
        for ranks in per_q.values():
            assert sorted(ranks) == [0, 1]


class TestMaxsimPlan:
    def test_no_python_in_plan(self, candidates):
        plan = inspect.executed_plan(maxsim_rerank(candidates, k=2))
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan

    def test_scoring_is_shuffle_free(self, spark):
        """The whole interaction is one row-local expression (r8
        redesign): no joins, no aggregates, no Exchange anywhere in the
        scoring plan — the only shuffle in the rerank path is the
        caller's rank window. (A literal input frame so the plan shows
        ONLY what maxsim_score adds.)"""
        flat = spark.createDataFrame(
            [("a b", "b c")], "source_item string, sim_item string")
        plan = inspect.executed_plan(maxsim_score(flat))
        for op in ("Exchange", "Join", "HashAggregate", "SortAggregate"):
            assert op not in plan, op

    def test_token_vec_arrays_bind_once(self, candidates):
        """The Generate barrier must survive optimization: if
        CollapseProject inlined the token-vector arrays into the
        interaction lambdas, the doc encode would re-run once per query
        token (the HOF-CSE trap). One Generate node, and the md5 token
        encode must appear in the Generate's projection, not in the
        scoring projection above it."""
        plan = inspect.executed_plan(maxsim_score(candidates))
        assert plan.count("Generate explode") == 1
