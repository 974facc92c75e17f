"""Document-corpus analysis operators (beyond-reference, north-star surface).

DataFrame-in / DataFrame-out wrappers over the column functions in
``functions/text.py``. Every derived column is a Catalyst expression —
whole-stage codegen over the string column, no Python workers — so these
run at full scan speed on a 100 TB documents table and the columns push
down/prune like any other projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T


def token_stats(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Token statistics per document: whitespace tokens, distinct tokens,
    BPE-ish token estimate, average token length."""
    return df.select(
        F.col(id_col),
        T.token_count(text_col).alias("n_tokens"),
        T.distinct_token_count(text_col).alias("n_distinct_tokens"),
        T.bpe_token_estimate(text_col).alias("n_bpe_tokens"),
        F.round(T.avg_token_length(text_col), 4).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, *, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Quality heuristics per document (C4-style cheap pre-filters)."""
    return df.select(
        F.col(id_col),
        F.round(T.stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(T.punct_ratio(text_col), 4).alias("punct_ratio"),
        F.round(T.quality_score(text_col), 4).alias("quality"),
    )


def detect_languages(df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Stopword-heuristic language id per document."""
    return df.select(
        F.col(id_col),
        T.detect_language(text_col).alias("lang_pred"),
    )


def fingerprints(df: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Content fingerprints: order-insensitive md5 set-fingerprint plus an
    order-sensitive polynomial rolling hash."""
    return df.select(
        F.col(id_col),
        T.fingerprint(text_col).alias("fingerprint"),
        T.rolling_hash(text_col).alias("rolling_hash"),
    )


def ngram_frequencies(df: DataFrame, *, text_col: str = "text", n: int = 3,
                      top: int | None = None) -> DataFrame:
    """Corpus-wide word n-gram frequencies (explode → hash aggregate with
    map-side partial combine). ``top`` keeps the most frequent shingles
    (ties broken by shingle text for determinism)."""
    # explode_outer + isNotNull: plain explode gets size/isnotnull filters
    # inferred beneath the Generate and pushdown inlines the n-gram
    # expression into them — 3× the tokenize CPU (see dedup.py).
    grams = df.select(F.explode_outer(T.word_ngrams(text_col, n))
                      .alias("ngram")).filter(F.col("ngram").isNotNull())
    freq = grams.groupBy("ngram").agg(F.count("*").alias("freq"))
    if top is not None:
        freq = freq.orderBy(F.col("freq").desc(), F.col("ngram").asc()).limit(top)
    return freq
