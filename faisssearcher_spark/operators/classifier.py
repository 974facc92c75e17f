"""Linear quality classifier for corpus filtering (GPT-3-style).

Beyond-reference, north-star surface: the GPT-3 data pipeline (Brown et
al. 2020, Appendix A) trains a linear classifier to separate a trusted
reference corpus from the raw crawl, scores every document, and keeps a
document stochastically when ``score > 1 − pareto(α)`` — high-quality
documents almost surely survive, low-quality ones survive with a long
Pareto tail so the filter doesn't collapse diversity. LLaMA/CCNet use
the same shape (fastText classifiers). This module reproduces it with:

- **training** on MLlib (``CountVectorizer`` vocabulary + distributed
  ``LogisticRegression``) — iterative optimization is what MLlib is for;
- **scoring** as a pure relational plan: the fitted model is just a
  Zipf-small ``(token, weight)`` table + an intercept, so scoring is
  explode → broadcast equi-join → per-row-key sum → sigmoid. No model
  object, no Python, no MLlib on the 100 TB scoring pass — the score
  column composes with every other curation operator and a SQL engine
  can replay it exactly (a ``model.transform`` scorer could not be
  oracle-checked);
- **the Pareto keep rule** on the engine-standard deterministic md5
  uniform, reproducible across runs/partitionings/engines like every
  sampler here (operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T
from faisssearcher_spark.operators.sampling import (SAMPLE_DENOM,
                                                    sample_bucket)


class QualityClassifier:
    """A fitted linear text classifier: ``(token, weight)`` table +
    intercept. ``P(quality) = sigmoid(intercept + Σ_occurrences w(tok))``
    — exactly MLlib LogisticRegression's probability on CountVectorizer
    counts (pinned to 1e-9 in tests), but evaluated relationally."""

    def __init__(self, weights: DataFrame, intercept: float, *,
                 token_col: str = "token", weight_col: str = "weight"):
        self.weights = weights.select(
            F.col(token_col).alias("__tok"),
            F.col(weight_col).cast("double").alias("__w"))
        self.intercept = float(intercept)

    def score(self, df: DataFrame, *, text_col: str = "text",
              out_col: str = "quality_score",
              tokens_col: str | None = None) -> DataFrame:
        """Append ``out_col`` ∈ (0, 1). Out-of-vocabulary tokens carry
        weight 0 (they were not features at train time). Empty documents
        score ``sigmoid(intercept)`` — the no-evidence prior.
        ``tokens_col`` reuses a pre-tokenized array column instead of
        re-tokenizing ``text_col`` (share-one-tokenize-scan).

        Scale shape: explode → token equi-join (AQE broadcasts the
        vocabulary) → one per-row-key sum; grouping is on a generated
        row key so duplicate rows never collapse (the wordvec/dsir
        discipline, r4 ADVICE)."""
        if out_col in df.columns:
            raise ValueError(f"column {out_col!r} already exists")
        if "__tok" in df.columns or "__w" in df.columns:
            # the explode would overwrite __tok and first("__tok") would
            # then aggregate the token, silently corrupting the column
            raise ValueError("input frame carries a reserved __tok/__w "
                             "column; rename it before scoring")
        doc_cols = df.columns
        rid = "__qc_rid"
        while rid in doc_cols:
            rid += "_"
        # row key in its own projection BELOW the generate (r5 review:
        # mid() in the same select as an explode re-evaluates per token)
        keyed = df.withColumn(rid, F.monotonically_increasing_id())
        units = (F.col(tokens_col) if tokens_col is not None
                 else T.tokens(text_col))
        ex = keyed.withColumn("__tok", F.explode_outer(units))
        margin = (F.lit(self.intercept)
                  + F.sum(F.coalesce("__w", F.lit(0.0))))
        return (ex.join(self.weights, "__tok", "left")
                .groupBy(rid)
                .agg(*[F.first(c).alias(c) for c in doc_cols],
                     (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)))
                     .alias(out_col))
                .select(*doc_cols, out_col))

    # -- persistence (the S2/S3 parquet-not-pickle discipline) -------------

    def save(self, path: str) -> None:
        import json
        import os

        spark = self.weights.sparkSession
        self.weights.write.mode("overwrite").parquet(
            os.path.join(path, "weights"))
        spark.createDataFrame(
            [(json.dumps({"intercept": self.intercept}),)], "meta string") \
            .coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(path, "meta"))

    @classmethod
    def load(cls, spark, path: str) -> "QualityClassifier":
        import json
        import os

        meta = json.loads(
            spark.read.parquet(os.path.join(path, "meta")).first()["meta"])
        weights = spark.read.parquet(os.path.join(path, "weights"))
        if not {"__tok", "__w"} <= set(weights.columns):
            raise ValueError("stored classifier weights missing columns — "
                             "corrupt model?")
        return cls(weights, meta["intercept"],
                   token_col="__tok", weight_col="__w")


def fit_quality_classifier(positive: DataFrame, negative: DataFrame, *,
                           text_col: str = "text",
                           vocab_size: int = 65_536,
                           max_iter: int = 50, reg_param: float = 0.0,
                           ) -> QualityClassifier:
    """Train the GPT-3-style quality filter: label the trusted reference
    corpus 1, the raw pool 0, fit bag-of-words logistic regression
    (MLlib ``CountVectorizer`` + ``LogisticRegression`` — both
    distributed; the vocabulary cap keeps the model Zipf-small), then
    export the coefficients as the ``(token, weight)`` table the
    relational scorer runs on. Training data at 100 TB scale is a
    SAMPLE of each corpus by construction — pass the sample in; the
    expensive side is scoring, which is the relational path.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import CountVectorizer

    pos = positive.select(T.tokens(text_col).alias("toks"),
                          F.lit(1.0).alias("label"))
    neg = negative.select(T.tokens(text_col).alias("toks"),
                          F.lit(0.0).alias("label"))
    data = pos.unionByName(neg)
    cv = CountVectorizer(inputCol="toks", outputCol="features",
                         vocabSize=vocab_size)
    cvm = cv.fit(data)
    # standardization=False: keep coefficients in raw count space so the
    # exported (token, weight) table reproduces the margin EXACTLY —
    # standardized training would bake per-feature scale factors into
    # the model object that the relational scorer can't see.
    lr = LogisticRegression(featuresCol="features", labelCol="label",
                            maxIter=max_iter, regParam=reg_param,
                            standardization=False)
    lrm = lr.fit(cvm.transform(data))
    coefs = lrm.coefficients.toArray()
    spark = positive.sparkSession
    # Arrow path: the vocabulary can be 10⁴-10⁵ rows and a Python
    # tuple-list createDataFrame pickles row-by-row (~1.5 s at 65k);
    # a pandas frame ships as one Arrow batch
    import pandas as pd
    weights = spark.createDataFrame(
        pd.DataFrame({"token": list(cvm.vocabulary),
                      "weight": coefs.astype(float)}))
    return QualityClassifier(weights, float(lrm.intercept))


def pareto_keep(scored: DataFrame, *, key_col: str,
                score_col: str = "quality_score", alpha: float = 9.0,
                seed: int = 42) -> DataFrame:
    """The GPT-3 keep rule (Brown et al. 2020, Appendix A): keep a
    document iff ``score > 1 − pareto(α)``. A score near 1 keeps almost
    surely; low scores survive with probability ``(2 − score)^{−α}`` —
    a deliberate long tail so the classifier's blind spots still
    contribute mass. α=9 is the paper's value.

    The Pareto draw is hash-derived (``u^{-1/α} − 1`` on the
    engine-standard md5 uniform, op-salt 'pareto' — decorrelated from
    the 'sample'/'pack'/'split'/'gumbel' families): membership is a
    pure function of (key, seed), so the filter is one scan — no
    shuffle, reproducible, append-stable.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    u = (sample_bucket(key_col, seed, op="pareto") + F.lit(0.5)) \
        / F.lit(float(SAMPLE_DENOM))
    par = F.pow(u, F.lit(-1.0 / alpha)) - F.lit(1.0)
    return scored.filter(F.col(score_col) > F.lit(1.0) - par)
