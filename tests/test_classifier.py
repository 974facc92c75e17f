"""GPT-3-style quality classifier (operators/classifier.py).

Semantics pinned here: the relational scorer reproduces MLlib
LogisticRegression's probability to 1e-9 (same margin algebra); a
separable corpus separates; OOV/empty docs score the intercept prior;
duplicate rows stay separate; the Pareto keep rule is deterministic,
score-monotone in keep RATE, and never drops score≈1 docs; save/load
roundtrips through parquet; the scoring plan is Python-free.
"""

import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.classifier import (QualityClassifier,
                                                      fit_quality_classifier,
                                                      pareto_keep)

GOOD = ["careful analysis of the measured results",
        "the experiment reports clear and reproducible evidence",
        "we describe the method and its measured limitations",
        "analysis shows the evidence supports the careful method"]
SPAM = ["buy now click here free offer",
        "click the free offer now and win",
        "win free money now buy buy",
        "offer free click win money here"]


@pytest.fixture(scope="module")
def model(spark):
    pos = spark.createDataFrame([(t,) for t in GOOD], "text string")
    neg = spark.createDataFrame([(t,) for t in SPAM], "text string")
    return fit_quality_classifier(pos, neg, max_iter=30)


def test_separates_held_in_corpora(spark, model):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + SPAM)],
        "doc_id long, text string")
    rows = model.score(docs).collect()
    good = [r["quality_score"] for r in rows if r["doc_id"] < len(GOOD)]
    spam = [r["quality_score"] for r in rows if r["doc_id"] >= len(GOOD)]
    assert min(good) > 0.9 > 0.1 > max(spam)


def test_relational_score_matches_mllib_probability(spark, model):
    """The exported (token, weight) table + intercept must reproduce the
    MLlib model's probability EXACTLY — same margin, same sigmoid."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizer
    from faisssearcher_spark.functions.text import tokens

    pos = spark.createDataFrame([(t,) for t in GOOD], "text string")
    neg = spark.createDataFrame([(t,) for t in SPAM], "text string")
    data = (pos.select(tokens("text").alias("toks"),
                       F.lit(1.0).alias("label"))
            .unionByName(neg.select(tokens("text").alias("toks"),
                                    F.lit(0.0).alias("label"))))
    cvm = CountVectorizer(inputCol="toks", outputCol="features").fit(data)
    lrm = LogisticRegression(featuresCol="features", labelCol="label",
                             maxIter=30, standardization=False) \
        .fit(cvm.transform(data))
    probe = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + SPAM + ["free careful now"])],
        "doc_id long, text string")
    mllib = {r["doc_id"]: float(r["probability"][1])
             for r in lrm.transform(
                 cvm.transform(probe.select("doc_id",
                                            tokens("text").alias("toks"))))
             .collect()}
    # rebuild the relational model from THIS fit so both sides share one
    # optimization trajectory
    weights = spark.createDataFrame(
        [(t, float(w)) for t, w in zip(cvm.vocabulary,
                                       lrm.coefficients.toArray())],
        "token string, weight double")
    qc = QualityClassifier(weights, float(lrm.intercept))
    ours = {r["doc_id"]: r["quality_score"]
            for r in qc.score(probe).collect()}
    for k in mllib:
        assert ours[k] == pytest.approx(mllib[k], abs=1e-9)


def test_oov_and_empty_score_the_prior(spark, model):
    docs = spark.createDataFrame(
        [(1, "zorble quux xyzzy"), (2, "")], "doc_id long, text string")
    rows = {r["doc_id"]: r["quality_score"]
            for r in model.score(docs).collect()}
    prior = 1.0 / (1.0 + math.exp(-model.intercept))
    assert rows[1] == pytest.approx(prior, abs=1e-9)
    assert rows[2] == pytest.approx(prior, abs=1e-9)


def test_duplicate_rows_stay_separate(spark, model):
    docs = spark.createDataFrame(
        [(1, GOOD[0]), (1, GOOD[0])], "doc_id long, text string")
    assert model.score(docs).count() == 2


def test_score_collision_rejected(spark, model):
    docs = spark.createDataFrame(
        [(1, "x")], "doc_id long, text string") \
        .withColumn("quality_score", F.lit(0.0))
    with pytest.raises(ValueError, match="already exists"):
        model.score(docs)


def test_scoring_plan_is_python_free(spark, model):
    docs = spark.createDataFrame([(1, GOOD[0])], "doc_id long, text string")
    plan = model.score(docs)._jdf.queryExecution().executedPlan().toString()
    for bad in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
        assert bad not in plan


def test_save_load_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "qc")
    model.save(path)
    back = QualityClassifier.load(spark, path)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(GOOD + SPAM)],
        "doc_id long, text string")
    want = {r["doc_id"]: r["quality_score"]
            for r in model.score(docs).collect()}
    got = {r["doc_id"]: r["quality_score"]
           for r in back.score(docs).collect()}
    # parquet roundtrip re-partitions the weights table, so the margin
    # sum order (and its last ulp) can shift — demand agreement to 1e-12
    # relative, not bitwise
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)


def test_pareto_keep_deterministic_and_monotone(spark):
    rows = [(i, 0.95 if i % 2 == 0 else 0.05) for i in range(2000)]
    scored = spark.createDataFrame(rows, "doc_id long, quality_score double")
    kept = pareto_keep(scored, key_col="doc_id", alpha=9.0)
    again = pareto_keep(scored, key_col="doc_id", alpha=9.0)
    a = sorted(r["doc_id"] for r in kept.collect())
    assert a == sorted(r["doc_id"] for r in again.collect())
    hi = sum(1 for i in a if i % 2 == 0) / 1000
    lo = sum(1 for i in a if i % 2 == 1) / 1000
    # keep probability: (2 - s)^(-alpha) -> 0.95: ~0.64, 0.05: ~0.003
    assert hi > 0.5 > 0.1 > lo
    # near-certain docs are never dropped (pareto draw > 0 a.s.)
    sure = spark.createDataFrame([(i, 1.0) for i in range(200)],
                                 "doc_id long, quality_score double")
    assert pareto_keep(sure, key_col="doc_id").count() == 200


def test_pareto_alpha_validation(spark):
    scored = spark.createDataFrame([(1, 0.5)],
                                   "doc_id long, quality_score double")
    with pytest.raises(ValueError, match="alpha"):
        pareto_keep(scored, key_col="doc_id", alpha=0.0)


def test_reserved_column_rejected(spark, model):
    docs = spark.createDataFrame([(1, "x", "y")],
                                 "doc_id long, text string, __tok string")
    with pytest.raises(ValueError, match="reserved"):
        model.score(docs)
