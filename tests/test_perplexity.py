"""CCNet-style perplexity filtering (operators/text_analysis.py:
unigram_logppl / perplexity_buckets; Wenzek et al. 2020).

Semantics pinned here: logppl is the mean per-token negative
log-likelihood under the add-s unigram LM (reserved OOV pseudo-type);
lower = more reference-like; empty docs get NULL logppl and bucket 0;
the ntile bucketing excludes NULLs from the tiling; the threshold mode
is a pure scan-side CASE equal to the ntile split at its own cut
points.
"""

import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.text_analysis import (
    fit_token_frequencies, perplexity_buckets, unigram_logppl)


@pytest.fixture(scope="module")
def lm_and_docs(spark):
    ref = spark.createDataFrame(
        [(1, "good clean prose"), (2, "clean prose flows")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "good clean prose"),          # pure in-vocab
         (11, "clean prose flows flows"),   # in-vocab, repeated
         (12, "zorble quux xyzzy"),         # pure OOV
         (13, "")],                         # empty
        "doc_id long, text string")
    vocab = fit_token_frequencies(ref)
    return vocab, docs


def _python_logppl(text, ref_texts, s=1.0):
    from collections import Counter
    tf = Counter(w for t in ref_texts for w in t.split())
    n, v = sum(tf.values()), len(tf)
    denom = n + s * (v + 1)
    toks = text.split()
    if not toks:
        return None
    return sum(-math.log((tf.get(w, 0) + s) / denom) for w in toks) / len(toks)


def test_logppl_matches_python_model(spark, lm_and_docs):
    vocab, docs = lm_and_docs
    ref_texts = ["good clean prose", "clean prose flows"]
    got = {r["doc_id"]: r["logppl"]
           for r in unigram_logppl(docs, vocab, score_scale=None).collect()}
    for doc_id, text in [(10, "good clean prose"),
                         (11, "clean prose flows flows"),
                         (12, "zorble quux xyzzy")]:
        assert got[doc_id] == pytest.approx(_python_logppl(text, ref_texts),
                                            abs=1e-12)
    assert got[13] is None


def test_logppl_orders_reference_like_below_oov(spark, lm_and_docs):
    vocab, docs = lm_and_docs
    got = {r["doc_id"]: r["logppl"]
           for r in unigram_logppl(docs, vocab).collect()}
    # pure in-vocab docs beat the pure-OOV doc
    assert got[10] < got[12] and got[11] < got[12]


def test_logppl_duplicate_ids_stay_separate(spark, lm_and_docs):
    vocab, _ = lm_and_docs
    dup = spark.createDataFrame(
        [(1, "good clean prose"), (1, "zorble quux xyzzy")],
        "doc_id long, text string")
    rows = unigram_logppl(dup, vocab).collect()
    assert len(rows) == 2
    assert len({r["logppl"] for r in rows}) == 2


def test_logppl_rejects_bad_smoothing(spark, lm_and_docs):
    vocab, docs = lm_and_docs
    with pytest.raises(ValueError, match="smoothing"):
        unigram_logppl(docs, vocab, smoothing=0.0)


def test_ntile_buckets_exclude_nulls_and_order(spark, lm_and_docs):
    vocab, docs = lm_and_docs
    scored = unigram_logppl(docs, vocab)
    out = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(scored, n_buckets=3).collect()}
    # 3 non-null scores -> one per bucket, ordered by logppl; empty doc 0
    assert out[13] == 0
    assert sorted([out[10], out[11], out[12]]) == [1, 2, 3]
    assert out[12] == 3  # the OOV doc has the worst perplexity


def test_threshold_mode_matches_ntile_cuts(spark, lm_and_docs):
    vocab, docs = lm_and_docs
    scored = unigram_logppl(docs, vocab).cache()
    vals = sorted(r["logppl"] for r in scored.collect()
                  if r["logppl"] is not None)
    # thresholds at the ntile cut points reproduce the ntile split
    thr = [vals[0], vals[1]]
    nt = {r["doc_id"]: r["ppl_bucket"]
          for r in perplexity_buckets(scored, n_buckets=3).collect()}
    th = {r["doc_id"]: r["ppl_bucket"]
          for r in perplexity_buckets(scored, n_buckets=3,
                                      thresholds=thr).collect()}
    assert nt == th


def test_threshold_mode_is_scan_only(spark, lm_and_docs):
    vocab, docs = lm_and_docs
    scored = unigram_logppl(docs, vocab)
    plan = perplexity_buckets(
        scored, n_buckets=2, thresholds=[5.0])._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan


def test_threshold_validation(spark, lm_and_docs):
    vocab, docs = lm_and_docs
    scored = unigram_logppl(docs, vocab)
    with pytest.raises(ValueError, match="thresholds"):
        perplexity_buckets(scored, n_buckets=3, thresholds=[1.0])
    with pytest.raises(ValueError, match="ascend"):
        perplexity_buckets(scored, n_buckets=3, thresholds=[2.0, 1.0])
    with pytest.raises(ValueError, match="already exists"):
        perplexity_buckets(scored.withColumn("ppl_bucket", F.lit(1)))


def test_normalize_text_canonicalizes_variants(spark):
    from faisssearcher_spark.functions.text import normalize_text
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO-WORLD."),
         (4, "  hello \t world  "), (5, "héllo world")],
        "id long, text string")
    out = {r["id"]: r["n"]
           for r in df.select("id", normalize_text("text").alias("n"))
           .collect()}
    # punctuation/casing/spacing variants collide...
    assert out[1] == out[2] == out[3] == out[4] == "hello world"
    # ...but non-ASCII letters are stripped, not folded (documented)
    assert out[5] == "h llo world"


def test_bigram_lm_is_order_sensitive(spark):
    """A scrambled document keeps its unigram perplexity but loses its
    bigram perplexity — the reason CCNet uses an n-gram LM."""
    ref = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox sleeps")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "the quick brown fox"),    # natural order
         (11, "fox brown quick the")],   # same tokens, scrambled
        "doc_id long, text string")
    uni = fit_token_frequencies(ref)
    bi = fit_token_frequencies(ref, ngram=2)
    u = {r["doc_id"]: r["logppl"]
         for r in unigram_logppl(docs, uni).collect()}
    b = {r["doc_id"]: r["logppl"]
         for r in unigram_logppl(docs, bi, ngram=2).collect()}
    assert u[10] == u[11]          # unigram LM is order-blind
    assert b[10] < b[11]           # bigram LM punishes the scramble


class TestBigramBackoff:
    """Stupid-backoff conditional bigram LM (bigram_backoff_logppl,
    Brants et al. 2007)."""

    def _score(self, spark, docs_rows, ref_rows, lam=0.4):
        from faisssearcher_spark.operators.text_analysis import (
            bigram_backoff_logppl)
        ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
        docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
        return {r["doc_id"]: (r["n_tokens"], r["bigram_logppl"])
                for r in bigram_backoff_logppl(
                    docs, ref, backoff=lam).collect()}

    def test_hand_computed_values(self, spark):
        """ref = 'a b a b': c1 = {a:2, b:2}, N=4; c2 = {(a,b):2, (b,a):1}.
        doc 'a b': -ln s1(a) = -ln(2/4); -ln s(b|a) = -ln(2/2) = 0."""
        out = self._score(spark, [(1, "a b")], [(0, "a b a b")])
        n, ppl = out[1]
        assert n == 2
        want = round((-math.log(2/4) + 0.0) / 2, 4)
        assert ppl == pytest.approx(want, abs=1e-9)

    def test_backoff_and_oov(self, spark):
        """'b b' : first token -ln(2/4); (b,b) unseen -> backoff
        -ln(0.4 * 2/4). 'z z': OOV floor -ln(0.4/4) then
        -ln(0.4 * 0.4/4)."""
        out = self._score(spark, [(1, "b b"), (2, "z z")],
                          [(0, "a b a b")])
        want1 = round((-math.log(2/4) - math.log(0.4 * 2/4)) / 2, 4)
        want2 = round((-math.log(0.4/4) - math.log(0.4 * 0.4/4)) / 2, 4)
        assert out[1][1] == pytest.approx(want1, abs=1e-9)
        assert out[2][1] == pytest.approx(want2, abs=1e-9)

    def test_order_sensitive(self, spark):
        """The conditional LM punishes a scramble the joint vocabulary
        would not: 'prose clean good' reverses every seen bigram."""
        ref = [(0, "good clean prose"), (1, "good clean prose flows")]
        out = self._score(spark, [(1, "good clean prose"),
                                  (2, "prose clean good")], ref)
        assert out[1][1] < out[2][1]

    def test_empty_doc_scores_null(self, spark):
        out = self._score(spark, [(1, "")], [(0, "a b")])
        assert out[1] == (0, None)

    def test_matches_corpus_reference(self, documents):
        """Whole-corpus parity against a driver Python replay (the same
        check the DuckDB gate makes at sf0.01)."""
        from collections import Counter

        from faisssearcher_spark.operators.text_analysis import (
            bigram_backoff_logppl)
        ref = documents.filter(F.col("source") == "src1")
        out = {r["doc_id"]: r["bigram_logppl"]
               for r in bigram_backoff_logppl(documents, ref).collect()}
        c1, c2 = Counter(), Counter()
        for r in ref.select("text").collect():
            t = r["text"].split()
            c1.update(t)
            c2.update(zip(t, t[1:]))
        N = sum(c1.values())

        def s1(w):
            return c1[w] / N if w in c1 else 0.4 / N

        for r in documents.select("doc_id", "text").collect():
            t = r["text"].split()
            if not t:
                assert out[r["doc_id"]] is None
                continue
            tot = -math.log(s1(t[0]))
            for a, b in zip(t, t[1:]):
                tot += (-math.log(c2[(a, b)] / c1[a]) if (a, b) in c2
                        else -math.log(0.4 * s1(b)))
            assert out[r["doc_id"]] == pytest.approx(
                round(tot / len(t), 4), abs=1e-9)

    def test_backoff_validated(self, spark):
        from faisssearcher_spark.operators.text_analysis import (
            bigram_backoff_logppl)
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="backoff"):
            bigram_backoff_logppl(df, df, backoff=0.0)
        with pytest.raises(ValueError, match="reference"):
            bigram_backoff_logppl(
                df, df.filter(F.col("doc_id") < 0))
