"""Corpus curation pipeline — the composed training-data use case.

Single operator chaining the engine's text-analysis and dedup stages the
way a pretraining data pipeline runs them at 100 TB:

    quality scores → threshold filter → language filter →
    exact dedup (content fingerprint) → near-dup dedup
    (MinHash-LSH pairs → connected components → keep min-id per cluster)

Everything before near-dup is a single scan-and-filter projection
(Catalyst collapses the stages; predicates on source columns push down).
The dedup stages join only survivors — filter-first ordering is the
dominant cost lever at scale: quality/lang typically cut 30-70% of a
web corpus before a single shuffle happens.

Every stage has an exact SQL twin, so the end-to-end pipeline is
oracle-checked (query ``curate_documents``), not just its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T
from faisssearcher_spark.operators import dedup


def curate_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    languages: tuple[str, ...] | None = None,
    near_dup_threshold: float | None = 0.5,
    minhash_hashes: int = 16,
    minhash_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Return the curated survivor set with per-doc quality metadata.

    Output: ``(doc_id, quality, lang_pred, n_tokens)`` — one row per
    surviving document, deterministic (min doc_id survives each exact and
    near-dup group).

    Driver-memory note: the near-dup stage resolves clusters through
    ``dedup.dedup_clusters``, whose default routes up to 1M near-dup
    edges (tens of MB) through the driver before falling back to the
    distributed branch — lower its ``driver_edge_threshold`` when running
    this pipeline with a constrained driver heap (see that docstring).
    """
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.round(T.quality_score(text_col), 4).alias("quality"),
        T.detect_language(text_col).alias("lang_pred"),
        T.token_count(text_col).alias("n_tokens"),
        T.fingerprint(text_col).alias("__fp"),
    )
    kept = scored.filter(F.col("quality") >= min_quality)
    if languages is not None:
        kept = kept.filter(F.col("lang_pred").isin(*languages))

    # exact dedup: one survivor (min id) per content fingerprint
    w = Window.partitionBy("__fp").orderBy(F.col("doc_id").asc())
    kept = (kept.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn", "__fp"))

    if near_dup_threshold is not None:
        # the survivor frame feeds BOTH the near-dup pair generation and
        # the final anti-join; persist it so the quality scoring + exact
        # dedup window (tokenize-heavy) computes once, not twice — at
        # pipeline scale this is the landing-table materialization the
        # streaming half writes anyway (streaming/curate.py)
        kept = kept.persist()
        pairs = dedup.minhash_lsh_join(
            kept, id_col="doc_id", text_col="text",
            num_hashes=minhash_hashes, bands=minhash_bands,
            shingle_n=shingle_n, verify_threshold=near_dup_threshold)
        clusters = dedup.dedup_clusters(pairs)
        # non-minimal cluster members are the near-dup casualties
        drop = clusters.filter(F.col("id") != F.col("cluster_id")) \
            .select(F.col("id").alias("doc_id"))
        kept = kept.join(drop, "doc_id", "left_anti")

    return kept.select("doc_id", "quality", "lang_pred", "n_tokens")
