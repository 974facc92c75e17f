"""BM25 lexical retrieval + RRF hybrid fusion (operators/bm25.py).

Semantics pinned here: scores equal a Python BM25 reference (Lucene idf,
k1=1.2, b=0.75, distinct query terms) to fp tolerance; a document is its
own best match; docs sharing no query term are absent; rrf_fuse equals
hand-computed reciprocal-rank sums and respects weights; the search plan
is Python-free with no cartesian product; the error surface.
"""

import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.bm25 import BM25Index, rrf_fuse

DOCS = [(0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick blue hare sleeps", "en"),
        (2, "brown foxes and brown dogs run together", "en"),
        (3, "completely unrelated text about spark shuffles", "en"),
        (4, "dog dog dog dog", "en")]


def _py_bm25(query, docs, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t, _ in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, ts in toks.items():
        s = 0.0
        for t in set(query.split()):
            tf = ts.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s:
            out[i] = s
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def index(corpus):
    return BM25Index().fit(corpus)


def test_scores_match_python_reference(spark, index):
    query = "quick brown dog"
    q = spark.createDataFrame([(1, query)], "qid long, text string")
    got = {r["sim_item"]: r["sim_val"]
           for r in index.search(q, k=10, query_item_col="qid").collect()}
    want = _py_bm25(query, DOCS)
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], rel=1e-12)


def test_self_retrieval_ranks_self_first(spark, corpus, index):
    q = corpus.select(F.col("doc_id").alias("qid"), "text")
    top = index.search(q, k=1, query_item_col="qid").collect()
    assert all(r["source_item"] == r["sim_item"] for r in top)


def test_no_shared_terms_means_absent(spark, index):
    q = spark.createDataFrame([(1, "zorble quux")], "qid long, text string")
    assert index.search(q, k=10, query_item_col="qid").count() == 0


def test_payload_and_rank(spark, index):
    q = spark.createDataFrame([(1, "brown dog")], "qid long, text string")
    rows = index.search(q, k=3, query_item_col="qid",
                        payload_cols=["lang"]).collect()
    assert all(r["lang"] == "en" for r in rows)
    assert sorted(r["rank_no"] for r in rows) == [0, 1, 2]


def test_search_plan_python_free_no_cartesian(spark, index):
    q = spark.createDataFrame([(1, "brown dog")], "qid long, text string")
    plan = index.search(q, k=3, query_item_col="qid") \
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in plan


def test_validation_errors(spark, corpus):
    with pytest.raises(ValueError, match="k1"):
        BM25Index(k1=-1)
    with pytest.raises(ValueError, match="k1"):
        BM25Index(b=1.5)
    with pytest.raises(RuntimeError, match="not fit"):
        BM25Index().search(corpus.select(F.col("doc_id").alias("query_id"),
                                         "text"))
    with pytest.raises(ValueError, match="non-empty"):
        BM25Index().fit(corpus.filter(F.col("doc_id") < 0))


def _ranked(spark, rows):
    return spark.createDataFrame(
        rows, "source_item long, sim_item long, rank_no int")


def test_rrf_matches_hand_computed(spark):
    # leg A ranks docs [10, 11, 12]; leg B ranks [11, 13, 10]
    a = _ranked(spark, [(1, 10, 0), (1, 11, 1), (1, 12, 2)])
    b = _ranked(spark, [(1, 11, 0), (1, 13, 1), (1, 10, 2)])
    got = {(r["sim_item"]): (r["sim_val"], r["rank_no"])
           for r in rrf_fuse([a, b], k=4, c=60).collect()}
    want = {10: 1 / 61 + 1 / 63, 11: 1 / 62 + 1 / 61,
            12: 1 / 63, 13: 1 / 62}
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d][0] == pytest.approx(s, abs=0)   # exact rationals
    order = sorted(want, key=lambda d: (-want[d], d))
    for rank, d in enumerate(order):
        assert got[d][1] == rank


def test_rrf_weights_shift_the_winner(spark):
    a = _ranked(spark, [(1, 10, 0), (1, 11, 1)])
    b = _ranked(spark, [(1, 11, 0), (1, 10, 1)])
    even = rrf_fuse([a, b], k=1).collect()[0]
    assert even["sim_item"] == 10   # symmetric scores, id tiebreak
    biased = rrf_fuse([a, b], k=1, weights=[0.1, 1.0]).collect()[0]
    assert biased["sim_item"] == 11


def test_rrf_validation(spark):
    a = _ranked(spark, [(1, 10, 0)])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="weights"):
        rrf_fuse([a, a], weights=[1.0])


def test_df_pruning_drops_stoplist_and_preserves_other_scores(spark):
    """'the' appears in 5/6 docs; with max_df_ratio=0.5 its postings
    vanish while rarer terms' contributions are unchanged (idf keeps the
    full N — pruning is a storage decision, not a model change)."""
    rows = [(0, "the quick fox"), (1, "the lazy dog"), (2, "the blue hare"),
            (3, "the tall tree"), (4, "the old boat"), (5, "rare words only")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    full = BM25Index().fit(corpus)
    pruned = BM25Index(max_df_ratio=0.5).fit(corpus)
    assert pruned._postings.filter(F.col("__tok") == "the").count() == 0
    assert full._postings.filter(F.col("__tok") == "the").count() == 5
    q = spark.createDataFrame([(1, "quick fox rare")], "qid long, text string")
    want = {r["sim_item"]: r["sim_val"]
            for r in full.search(q, k=10, query_item_col="qid").collect()}
    got = {r["sim_item"]: r["sim_val"]
           for r in pruned.search(q, k=10, query_item_col="qid").collect()}
    assert got == want   # no query term was pruned -> identical scores
    with pytest.raises(ValueError, match="max_df_ratio"):
        BM25Index(max_df_ratio=1.5)


def test_add_items_scores_with_frozen_stats(spark):
    base = [(0, "the quick fox"), (1, "lazy dog naps"), (2, "blue hare runs")]
    corpus = spark.createDataFrame(base, "doc_id long, text string")
    idx = BM25Index().fit(corpus)
    n0, avgdl0 = idx.n_docs, idx.avgdl
    idx.add_items(spark.createDataFrame([(3, "dog dog barks loud")],
                                        "doc_id long, text string"))
    assert (idx.n_docs, idx.avgdl) == (n0, avgdl0)   # frozen at fit
    q = spark.createDataFrame([(1, "dog")], "qid long, text string")
    got = {r["sim_item"]: r["sim_val"]
           for r in idx.search(q, k=10, query_item_col="qid").collect()}
    assert set(got) == {1, 3}   # the added doc is findable
    # the added doc scores by the FIT-time model: tf=2, df('dog')=1,
    # n=3, dl=4, avgdl=3
    import math as m
    idf = m.log(1 + (3 - 1 + 0.5) / (1 + 0.5))
    want = idf * 2 * 2.2 / (2 + 1.2 * (1 - 0.75 + 0.75 * 4 / 3))
    assert got[3] == pytest.approx(want, rel=1e-12)
    # unseen-at-fit terms carry no weight in the frozen model
    q2 = spark.createDataFrame([(1, "barks")], "qid long, text string")
    assert idx.search(q2, k=10, query_item_col="qid").count() == 0
    with pytest.raises(RuntimeError, match="not fit"):
        BM25Index().add_items(corpus)


def test_bm25_save_load_roundtrip(spark, corpus, index, tmp_path):
    path = str(tmp_path / "bm25_idx")
    index.save(path)
    back = BM25Index.load(spark, path)
    assert (back.n_docs, back.avgdl) == (index.n_docs, index.avgdl)
    q = spark.createDataFrame([(1, "quick brown dog")], "qid long, text string")
    want = {(r["source_item"], r["sim_item"]): r["sim_val"]
            for r in index.search(q, k=10, query_item_col="qid").collect()}
    got = {(r["source_item"], r["sim_item"]): r["sim_val"]
           for r in back.search(q, k=10, query_item_col="qid").collect()}
    assert got.keys() == want.keys()
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12)
    with pytest.raises(RuntimeError, match="nothing to save"):
        BM25Index().save(str(tmp_path / "nope"))


def test_mine_hard_negatives_drops_gold_and_reranks(spark, corpus, index):
    q = corpus.select(F.col("doc_id").alias("qid"), "text")
    ranked = index.search(q, k=5, query_item_col="qid")
    # gold = the self match (rank 0 for every query here)
    gold = spark.createDataFrame([(i, i) for i in range(5)],
                                 "source_item long, sim_item long")
    from faisssearcher_spark.operators.bm25 import mine_hard_negatives
    neg = mine_hard_negatives(ranked, gold, k=3)
    rows = neg.collect()
    assert all(r["source_item"] != r["sim_item"] for r in rows)
    # re-ranked densely from 0 per query
    for qid in {r["source_item"] for r in rows}:
        ranks = sorted(r["rank_no"] for r in rows if r["source_item"] == qid)
        assert ranks == list(range(len(ranks)))
    # ordering preserved: negatives keep their relative retrieval order
    before = {(r["source_item"], r["sim_item"]): r["rank_no"]
              for r in ranked.collect()}
    for qid in {r["source_item"] for r in rows}:
        mine = sorted((r["rank_no"], r["sim_item"]) for r in rows
                      if r["source_item"] == qid)
        orig = [s for _, s in sorted((before[(qid, s)], s)
                                     for _, s in mine)]
        assert [s for _, s in mine] == orig
    with pytest.raises(ValueError, match="columns"):
        mine_hard_negatives(ranked.drop("sim_item"), gold)
