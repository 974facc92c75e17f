"""Retrieval-metric suite (operators/evaluation.py): hand-computed
values, degenerate queries, and the literal-discount portability rule."""

import math

import pytest

from faisssearcher_spark.operators import evaluation as E


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def _by_q(df):
    return {r["source_item"]: r.asDict() for r in df.collect()}


def test_discount_tables_match_log2():
    disc = E.dcg_discounts(5)
    assert disc[0] == 1.0
    for r, w in enumerate(disc):
        assert w == 1.0 / math.log2(r + 2)
    ideal = E.idcg_totals(5)
    assert ideal[0] == 1.0
    # cumulative, strictly increasing, fixed-order sums
    acc = 0.0
    for m, tot in enumerate(ideal):
        acc += disc[m]
        assert tot == acc


def test_perfect_retrieval_scores_one(spark):
    res = _mk(spark, [("q", i, r) for r, i in enumerate([10, 11, 12])],
              ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q", 10), ("q", 11), ("q", 12)],
                ["source_item", "sim_item"])
    out = _by_q(E.retrieval_metrics(res, truth, k=3))["q"]
    assert out == {"source_item": "q", "n_rel": 3, "n_hits": 3,
                   "recall_at_k": 1.0, "precision_at_k": 1.0,
                   "rr": 1.0, "ap": 1.0, "ndcg": 1.0}


def test_zero_hits_scores_zero_and_query_survives(spark):
    res = _mk(spark, [("q", 99, 0)], ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q", 1), ("q", 2)], ["source_item", "sim_item"])
    out = _by_q(E.retrieval_metrics(res, truth, k=3))["q"]
    assert out["n_rel"] == 2 and out["n_hits"] == 0
    for m in ("recall_at_k", "precision_at_k", "rr", "ap", "ndcg"):
        assert out[m] == 0.0


def test_hand_computed_partial_case(spark):
    # k=5, truth={a,b,c}; retrieved ranks: a@0, x@1, b@3 -> hits at 0 and 3
    res = _mk(spark, [("q", "a", 0), ("q", "x", 1), ("q", "y", 2),
                      ("q", "b", 3), ("q", "z", 4)],
              ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q", "a"), ("q", "b"), ("q", "c")],
                ["source_item", "sim_item"])
    out = _by_q(E.retrieval_metrics(res, truth, k=5))["q"]
    assert out["n_hits"] == 2
    assert out["recall_at_k"] == round(2 / 3, 4)
    assert out["precision_at_k"] == round(2 / 5, 4)
    assert out["rr"] == 1.0                      # first hit at rank 0
    # AP: (1/1 + 2/4) / min(3,5)
    assert out["ap"] == round((1.0 + 0.5) / 3, 4)
    disc = E.dcg_discounts(5)
    assert out["ndcg"] == round((disc[0] + disc[3]) / E.idcg_totals(5)[2], 4)


def test_rank_at_or_past_k_ignored(spark):
    res = _mk(spark, [("q", "a", 2), ("q", "b", 7)],
              ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q", "a"), ("q", "b")],
                ["source_item", "sim_item"])
    out = _by_q(E.retrieval_metrics(res, truth, k=3))["q"]
    assert out["n_hits"] == 1 and out["rr"] == round(1 / 3, 4)


def test_truth_larger_than_k_normalizes_by_k(spark):
    # 8 relevant, k=3, all three retrieved slots relevant: ap and ndcg
    # normalize by min(n_rel, k)=3 so a perfect top-3 still scores 1.0.
    res = _mk(spark, [("q", i, r) for r, i in enumerate([1, 2, 3])],
              ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q", i) for i in range(1, 9)],
                ["source_item", "sim_item"])
    out = _by_q(E.retrieval_metrics(res, truth, k=3))["q"]
    assert out["recall_at_k"] == round(3 / 8, 4)
    assert out["ap"] == 1.0 and out["ndcg"] == 1.0


def test_duplicate_result_rows_count_one_hit(spark):
    """A fused/unioned results frame repeating an item at two ranks must
    count ONE hit at its best rank — metrics can never exceed 1.0."""
    res = _mk(spark, [("q", "a", 0), ("q", "a", 1)],
              ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q", "a")], ["source_item", "sim_item"])
    out = _by_q(E.retrieval_metrics(res, truth, k=2))["q"]
    assert out["n_hits"] == 1
    assert out["recall_at_k"] == 1.0 and out["ap"] == 1.0
    assert out["ndcg"] == 1.0 and out["rr"] == 1.0


def test_duplicate_truth_rows_deduped(spark):
    res = _mk(spark, [("q", "a", 0)], ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q", "a"), ("q", "a"), ("q", "b")],
                ["source_item", "sim_item"])
    out = _by_q(E.retrieval_metrics(res, truth, k=2))["q"]
    assert out["n_rel"] == 2 and out["n_hits"] == 1
    assert out["recall_at_k"] == 0.5


def test_k_must_be_positive(spark):
    df = _mk(spark, [("q", "a", 0)], ["source_item", "sim_item", "rank_no"])
    with pytest.raises(ValueError, match="k must be"):
        E.retrieval_metrics(df, df.select("source_item", "sim_item"), k=0)


def test_standalone_retrieval_eval_matches_duckdb(spark):
    """The bench-only standalone gate (registry.q_retrieval_eval) isn't in
    the 50-row driver gate set — its metric columns are driver-gated via
    the ann_lsh_bucket_top3 fold — so its DuckDB twin is pinned here at
    sf0.001 with the same canonicalization the driver uses."""
    import duckdb

    from faisssearcher_spark import registry

    sf = "/root/testdata/sf0.001"
    sdf = registry.q_retrieval_eval(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS "
                f"SELECT * FROM '{sf}/embeddings.parquet'")
    ddf = con.execute(registry._oracle_retrieval_eval()).fetchdf()

    def canon(df):
        df = df[sorted(df.columns)].astype(str)
        return sorted(map(tuple, df.values.tolist()))

    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) > 0
    assert canon(sdf) == canon(ddf)


def _py_metrics(res_ranks, truth, k):
    """Pure-python reference: res_ranks = {item: rank}, truth = set."""
    n_rel = len(truth)
    hit_ranks = sorted(r for i, r in res_ranks.items()
                       if r < k and i in truth)
    n_hits = len(hit_ranks)
    disc = E.dcg_discounts(k)
    ap = sum((j + 1) / (r + 1) for j, r in enumerate(hit_ranks))
    dcg = sum(disc[r] for r in hit_ranks)
    m = min(n_rel, k)
    return {
        "n_rel": n_rel, "n_hits": n_hits,
        "recall_at_k": round(n_hits / n_rel, 4),
        "precision_at_k": round(n_hits / k, 4),
        "rr": round(1.0 / (hit_ranks[0] + 1), 4) if hit_ranks else 0.0,
        "ap": round(ap / m, 4),
        "ndcg": round(dcg / E.idcg_totals(k)[m - 1], 4),
    }


def test_random_cases_match_python_reference(spark):
    """40 seeded random (results, truth) queries in one frame, checked
    metric-by-metric against an independent pure-python computation;
    also pins the [0, 1] range on every metric."""
    import random

    rng = random.Random(99)
    res_rows, truth_rows, expect = [], [], {}
    for qi in range(40):
        q = f"q{qi}"
        k = rng.choice([1, 3, 5])
        items = rng.sample(range(20), k=rng.randint(1, 8))
        res_ranks = {it: r for r, it in enumerate(items)}
        truth = set(rng.sample(range(20), k=rng.randint(1, 6)))
        res_rows += [(q, it, r, k) for it, r in res_ranks.items()]
        truth_rows += [(q, it) for it in truth]
        expect[q] = (k, _py_metrics(res_ranks, truth, k))
    truth_df = _mk(spark, truth_rows, ["source_item", "sim_item"])
    for k in (1, 3, 5):
        qs = [q for q, (kk, _) in expect.items() if kk == k]
        res_df = _mk(spark, [r[:3] for r in res_rows if r[3] == k],
                     ["source_item", "sim_item", "rank_no"])
        got = _by_q(E.retrieval_metrics(
            res_df, truth_df.join(
                res_df.select("source_item").distinct(), "source_item"),
            k=k))
        assert set(got) == set(qs)
        for q in qs:
            want = expect[q][1]
            for mname, val in want.items():
                assert got[q][mname] == val, (q, mname, got[q], want)
                if mname not in ("n_rel", "n_hits"):
                    assert 0.0 <= got[q][mname] <= 1.0


def test_summarize_macro_means(spark):
    res = _mk(spark, [("q1", "a", 0), ("q2", "z", 0)],
              ["source_item", "sim_item", "rank_no"])
    truth = _mk(spark, [("q1", "a"), ("q2", "b")],
                ["source_item", "sim_item"])
    per_q = E.retrieval_metrics(res, truth, k=1)
    row = E.summarize_retrieval(per_q).collect()[0]
    assert row["n_queries"] == 2
    # q1 perfect (all 1.0), q2 zero -> every macro mean is 0.5
    for m in ("recall_at_k", "precision_at_k", "mrr", "map", "ndcg"):
        assert row[m] == 0.5
