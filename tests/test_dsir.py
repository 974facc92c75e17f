"""DSIR importance weighting (operators/text_analysis.py:dsir_log_weights)
and Gumbel-top-k weighted sampling (operators/sampling.py:gumbel_topk_sample).

Semantics pinned here: logw is the add-s unigram log-likelihood ratio with
a reserved OOV pseudo-type; higher logw = more target-like; the Gumbel
draw is a pure function of (key, seed, weights) — stable under
repartitioning — and extreme weights dominate the noise.
"""

import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.sampling import gumbel_topk_sample
from faisssearcher_spark.operators.text_analysis import (
    dsir_log_weights, fit_token_frequencies)


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(1, "good clean prose"), (2, "clean prose flows")],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "good clean prose"), (2, "clean prose flows"),
         (3, "spam spam spam buy"), (4, "buy spam now")],
        "doc_id long, text string")
    return target, raw


def _python_logw(text, target_texts, raw_texts, s=1.0):
    from collections import Counter
    tf_t = Counter(w for t in target_texts for w in t.split())
    tf_r = Counter(w for t in raw_texts for w in t.split())
    vocab = set(tf_t) | set(tf_r)
    n_t, n_r, v = sum(tf_t.values()), sum(tf_r.values()), len(vocab)
    dt, dr = n_t + s * (v + 1), n_r + s * (v + 1)
    return sum(
        math.log((tf_t.get(w, 0) + s) / dt)
        - math.log((tf_r.get(w, 0) + s) / dr)
        for w in text.split())


def test_matches_python_replication(spark, corpora):
    target, raw = corpora
    tv, rv = fit_token_frequencies(target), fit_token_frequencies(raw)
    docs = spark.createDataFrame(
        [(10, "clean prose"), (11, "spam buy"), (12, "zzz unseen"),
         (13, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dsir_log_weights(docs, tv, rv,
                                     score_scale=None).collect()}
    t_texts = ["good clean prose", "clean prose flows"]
    r_texts = t_texts + ["spam spam spam buy", "buy spam now"]
    for did, text in [(10, "clean prose"), (11, "spam buy"),
                      (12, "zzz unseen")]:
        assert out[did]["logw"] == pytest.approx(
            _python_logw(text, t_texts, r_texts), abs=1e-9)
        assert out[did]["n_tokens"] == len(text.split())
    # empty document: zeros, still present
    assert (out[13]["n_tokens"], out[13]["logw"]) == (0, 0.0)
    # ordering: target-like > OOV > raw-junk... verify the key contrast
    assert out[10]["logw"] > 0 > out[11]["logw"]


def test_smoothing_validation(spark, corpora):
    target, raw = corpora
    tv, rv = fit_token_frequencies(target), fit_token_frequencies(raw)
    with pytest.raises(ValueError):
        dsir_log_weights(target, tv, rv, smoothing=0.0)


def test_gumbel_topk_deterministic_and_stable(documents):
    w = documents.select("doc_id", "text",
                         (F.col("n_chars") / 100.0).alias("w"))
    a = {r["doc_id"] for r in gumbel_topk_sample(
        w, k=20, weight_col="w", key_col="doc_id").select("doc_id").collect()}
    b = {r["doc_id"] for r in gumbel_topk_sample(
        w.repartition(13), k=20, weight_col="w",
        key_col="doc_id").select("doc_id").collect()}
    assert a == b and len(a) == 20
    # a different seed draws a different set
    c = {r["doc_id"] for r in gumbel_topk_sample(
        w, k=20, weight_col="w", key_col="doc_id",
        seed=7).select("doc_id").collect()}
    assert c != a


def test_gumbel_extreme_weight_dominates(spark):
    rows = [(i, 0.0) for i in range(200)] + [(999, 50.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    top = {r["id"] for r in gumbel_topk_sample(
        df, k=5, weight_col="w", key_col="id").collect()}
    assert 999 in top
    with pytest.raises(ValueError):
        gumbel_topk_sample(df, k=0, weight_col="w", key_col="id")


def test_gumbel_is_weighted_not_uniform(spark):
    """Rows with weight ln(100) should appear ~100x as often as weight-0
    rows; check the sampled set is overwhelmingly the heavy half."""
    heavy = [(i, math.log(100.0)) for i in range(100)]
    light = [(i, 0.0) for i in range(100, 200)]
    df = spark.createDataFrame(heavy + light, "id long, w double")
    top = [r["id"] for r in gumbel_topk_sample(
        df, k=50, weight_col="w", key_col="id").collect()]
    n_heavy = sum(1 for i in top if i < 100)
    assert n_heavy >= 45   # P[much lower] is negligible at 100:1 odds


def test_duplicate_ids_score_per_row(spark, corpora):
    """Duplicate id values must NOT merge into one combined score (the
    wordvec encode_df defect class): each row scores independently."""
    target, raw = corpora
    tv, rv = fit_token_frequencies(target), fit_token_frequencies(raw)
    docs = spark.createDataFrame(
        [(1, "clean prose"), (1, "spam buy")],
        "doc_id long, text string")
    rows = dsir_log_weights(docs, tv, rv).collect()
    assert len(rows) == 2
    assert sorted(r["n_tokens"] for r in rows) == [2, 2]
    signs = sorted(r["logw"] > 0 for r in rows)
    assert signs == [False, True]   # one target-like, one junk


def test_gumbel_never_clobbers_user_column(spark):
    df = spark.createDataFrame([(1, 0.5, "x")], "id long, w double, __gkey string")
    out = gumbel_topk_sample(df, k=1, weight_col="w", key_col="id")
    assert out.columns == ["id", "w", "__gkey"]
    assert out.collect()[0]["__gkey"] == "x"
