"""Streaming document curation — the ingest-time half of the batch
curation pipeline (operators/curate.py).

A landing-zone document stream gets, in order:

1. **stateless scoring + filters** (quality, language) — pure Catalyst
   expressions, no state;
2. **deterministic hash sampling** (operators/sampling.py) — a stateless
   pure-function filter, so stream and batch select exactly the same
   rows;
3. **exact dedup within the watermark** — first arrival of a content
   fingerprint wins, duplicate arrivals inside the watermark horizon are
   dropped, state expires with the watermark
   (``dropDuplicatesWithinWatermark``).

Near-duplicate (MinHash) dedup deliberately stays a batch post-pass:
it is a self-join over the corpus, which Structured Streaming cannot
express incrementally with bounded state — the production shape is
"stream-curate into a landing table, near-dup compaction batch job on
top" (operators/curate.py runs that second stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T
from faisssearcher_spark.operators import sampling


def curate_stream(stream: DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id", ts_col: str = "ingest_ts",
                  min_quality: float = 0.3,
                  languages: tuple[str, ...] | None = None,
                  min_lang_conf: float | None = None,
                  lang_conf_temperature: float = 0.05,
                  exsub_min_len: "int | str | None" = None,
                  sample_fraction: float | None = None,
                  seed: int = 42,
                  watermark: str = "1 hour") -> DataFrame:
    """Curate a streaming document source. Returns the surviving rows with
    ``(id, quality, lang_pred, n_tokens, fingerprint, ts)`` — one row per
    first-seen content fingerprint that passed every filter.
    ``min_lang_conf`` mirrors the batch pipeline's opt-in confidence
    threshold (a ``lang_conf`` column joins the output when set), with
    ``lang_conf_temperature`` threading the same softmax temperature the
    batch surface takes — a tuned temperature keeps identical threshold
    semantics across both.

    ``exsub_min_len`` is REFUSED here (loudly, not ignored): ExactSubstr
    removal is a duplicated-run self-join over the whole corpus, and the
    ``"auto"`` spelling additionally eager-profiles the corpus's
    duplication spectrum — neither exists incrementally with bounded
    state. Run it where near-dup dedup already runs: the batch
    compaction pass over the landing table
    (``prepare_pretraining_data(exsub_min_len=...)``)."""
    if exsub_min_len is not None:
        raise ValueError(
            "exsub_min_len is batch-only: ExactSubstr removal needs a "
            "whole-corpus self-join (and 'auto' an eager duplication "
            "profile), which a stream cannot express with bounded "
            "state. Run prepare_pretraining_data(exsub_min_len=...) on "
            "the landing table instead.")
    if min_lang_conf is not None:
        # tokenize-once for the opted-in confidence path (the batch
        # pipeline's discipline — see operators/curate.py)
        scored = stream.withColumn("__lt", T.tokens(text_col)).select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("ingest_ts"),
            F.round(T.quality_score(text_col), 4).alias("quality"),
            T.detect_language_from_tokens(F.col("__lt"))
            .alias("lang_pred"),
            F.round(T.language_confidence_from_tokens(
                F.col("__lt"), temperature=lang_conf_temperature), 4)
            .alias("lang_conf"),
            F.size("__lt").alias("n_tokens"),
            T.fingerprint(text_col).alias("fingerprint"),
        )
    else:
        scored = stream.select(
            F.col(id_col).alias("doc_id"),
            F.col(ts_col).alias("ingest_ts"),
            F.round(T.quality_score(text_col), 4).alias("quality"),
            T.detect_language(text_col).alias("lang_pred"),
            T.token_count(text_col).alias("n_tokens"),
            T.fingerprint(text_col).alias("fingerprint"),
        )
    kept = scored.filter(F.col("quality") >= min_quality)
    if languages is not None:
        kept = kept.filter(F.col("lang_pred").isin(*languages))
    if min_lang_conf is not None:
        kept = kept.filter(F.col("lang_conf") >= min_lang_conf)
    if sample_fraction is not None:
        # before dedup: membership is a pure function of doc_id, so the
        # sampled set is identical to the batch pipeline's regardless of
        # arrival order
        kept = sampling.hash_sample(kept, sample_fraction,
                                    key_col="doc_id", seed=seed)
    # NB: rows whose event time sits at/below the current watermark are
    # dropped as late — including an event time of exactly epoch 0
    # against the INITIAL watermark. Synthetic replays must offset their
    # timestamps away from epoch 0 (registry.q_curate_stream does).
    return (kept.withWatermark("ingest_ts", watermark)
            .dropDuplicatesWithinWatermark(["fingerprint"]))
