"""Tests for operators/rerank.py (reference U6 interact rerank)."""

from faisssearcher_spark.operators import rerank


class TestRerank:
    def test_token_jaccard_reranks(self, spark):
        cands = spark.createDataFrame(
            [("red blue green", "red blue green", 0.5),   # exact -> jac 1.0
             ("red blue green", "red yellow", 0.9),       # jac 1/4
             ("red blue green", "purple", 0.99)],         # jac 0
            "source_item string, sim_item string, sim_val double")
        out = rerank.rerank_pairs(cands, k=2, score_scale=4).collect()
        by_rank = {r["rank_no"]: r for r in out}
        assert len(out) == 2
        assert by_rank[0]["sim_item"] == "red blue green"
        assert by_rank[0]["rerank_score"] == 1.0
        assert by_rank[1]["sim_item"] == "red yellow"
        assert abs(by_rank[1]["rerank_score"] - 0.25) < 1e-9

    def test_custom_scorer(self, spark):
        import pandas as pd

        def length_diff(a: pd.Series, b: pd.Series) -> pd.Series:
            return -(a.str.len() - b.str.len()).abs().astype("float64")

        cands = spark.createDataFrame(
            [("abc", "ab", 0.0), ("abc", "abcd", 0.0), ("abc", "xyz", 0.0)],
            "source_item string, sim_item string, sim_val double")
        out = rerank.rerank_pairs(cands, scorer=length_diff, k=1).collect()
        assert out[0]["sim_item"] == "xyz"  # equal length wins (diff 0)

    def test_keeps_payload_columns(self, spark):
        cands = spark.createDataFrame(
            [("a b", "a b", 0.1, "en")],
            "source_item string, sim_item string, sim_val double, lang string")
        out = rerank.rerank_pairs(cands).collect()
        assert out[0]["lang"] == "en" and out[0]["rank_no"] == 0
