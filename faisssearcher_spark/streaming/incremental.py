"""Streaming near-duplicate screening: the MinHashStore arc under a
stream, replay-safe.

The batch half (operators/incremental.py) answers "has anything LIKE
this been ingested before?" for explicit batches; this sink runs the
same screen continuously: every micro-batch is checked against the
signatures of every PRIOR epoch, survivors land in ``out_dir``, and
the survivors' signatures become this epoch's state.

Replay safety is the part that needs care — and the reason this is NOT
just ``MinHashStore.commit`` inside ``foreachBatch``: an append-mode
commit replayed after a checkpoint rollback would re-screen the batch
against state that already CONTAINS the batch itself, flag every row a
duplicate, and silently drop the data. Instead, state follows the
epoch discipline of streaming/sketches.py: epoch ``N``'s signatures
are written by OVERWRITING ``<store_dir>/epoch=N``, and the screen
reads only epochs ``< N`` (one partition-pruned scan — ``epoch`` is a
partition column, so Spark never opens newer directories). A
re-delivered batch therefore recomputes the identical screen over the
identical prior state and overwrites byte-identical outputs.

Scope: the screen is against HISTORY only; in-batch near-dups ride one
additional banded self-join over the batch's own signatures
(``dedup_within_batch=True``, keep-min-id) — both joins reuse the
exact arithmetic of the batch operators, so results match a batch
replay of the same prefix.
"""

from __future__ import annotations

import json

from typing import Iterator  # noqa: F401  (doc parity with siblings)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from faisssearcher_spark.operators.incremental import banded_signatures
from faisssearcher_spark.streaming.sketches import (_epoch_path, _epochs,
                                                    _fs_path)

__all__ = ["embedding_screen_sink", "fingerprint_screen_sink",
           "minhash_screen_sink", "watermark_exact_screen"]


def watermark_exact_screen(stream_df: DataFrame, *,
                           key_cols: "str | list[str]",
                           event_time_col: str,
                           watermark: str = "1 hour") -> DataFrame:
    """Event-time-bounded EXACT-dedup screen for composing ahead of the
    near-dup sinks: first arrival of a key wins, re-deliveries within
    the watermark horizon are dropped, and the key state expires with
    the watermark (``dropDuplicatesWithinWatermark`` — bounded state,
    unlike a plain streaming ``dropDuplicates`` whose state grows with
    the corpus forever).

    This is the at-least-once-ingest guard: an upstream source that
    re-delivers rows under the SAME id would otherwise reach the
    near-dup screen, where an id-equal re-delivery is deliberately NOT
    a duplicate (equal ids are the same row re-screened — the store
    contract) and content-changed re-deliveries under one id would
    land twice. Screening here is by KEY within the watermark; content
    near-dups remain the sinks' job. A re-delivery arriving AFTER the
    watermark expired its key passes through to the near-dup screen —
    content-exact re-deliveries are still caught there (an exact dup
    estimates Jaccard/cosine 1.0 at any threshold), so the watermark
    bound trades only the id-keyed guarantee, never content dedup.

    Semantics are batch-boundary- and watermark-state-dependent, so
    this screen is pytest-pinned (parity vs the batch pipeline over a
    replayed multi-batch stream) rather than SQL-oracle-gated — the
    approx-path precedent; the underlying operator's one-row-per-key
    guarantee IS oracle-gated via the curate_stream fingerprint leg."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return (stream_df.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def _guard_sink_meta(spark, store_dir: str, params: dict,
                     batch_id: int) -> None:
    """Parameter-identity guard for the screen sinks — the store-class
    meta discipline applied to the function sinks: state banded or
    signed under one parameter plan never matches state from another,
    so a checkpoint RESUME (batch_id > 0) under changed parameters
    would silently stop screening. Batch 0 (fresh/reset checkpoint —
    epochs are truncated anyway) clears old markers and stamps
    ``<store_dir>/_sink_meta-<md5(params)>``; every later batch
    requires the marker to match. The marker is an empty file whose
    NAME carries the identity, so validation is one fs.exists — no
    content reads through the JVM gateway, no Spark jobs."""
    import hashlib

    tag = hashlib.md5(json.dumps(params, sort_keys=True)
                      .encode()).hexdigest()[:16]
    fs, _ = _fs_path(spark, store_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    marker = jpath(f"{store_dir}/_sink_meta-{tag}")
    if batch_id == 0:
        stale = fs.globStatus(jpath(f"{store_dir}/_sink_meta-*"))
        for st in (stale or []):
            fs.delete(st.getPath(), False)
        fs.mkdirs(jpath(store_dir))
        fs.create(marker, True).close()
        return
    if fs.exists(marker):
        return
    others = fs.globStatus(jpath(f"{store_dir}/_sink_meta-*"))
    if others is not None and len(others) > 0:
        raise ValueError(
            f"sink state at {store_dir!r} was written under different "
            f"parameters than {params} — a checkpoint resume under a "
            "changed plan appends state that never matches and the "
            "screen silently stops catching duplicates; keep the "
            "original parameters or start a fresh checkpoint + "
            "store_dir")
    # pre-guard state (no marker at all): stamp and continue — the
    # caller's parameters are the only identity we have
    fs.create(marker, True).close()


def _truncate_stale_epochs(spark, roots, batch_id: int) -> None:
    """Batch 0 on a fresh/reset checkpoint: every input re-delivers;
    surviving epoch dirs are stale state from a previous run (the
    streaming/sketches batch-0 truncation discipline)."""
    if batch_id != 0:
        return
    for root in roots:
        fs, _ = _fs_path(spark, root)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        for e in _epochs(spark, root):
            fs.delete(jpath(_epoch_path(root, e)), True)


def minhash_screen_sink(stream_df: DataFrame, *, store_dir: str,
                        out_dir: str, checkpoint_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.7, num_hashes: int = 16,
                        bands: int = 4, shingle_n: int | None = 3,
                        seed: int = 42,
                        dedup_within_batch: bool = True,
                        exact_dedup_keys: "str | list[str] | None" = None,
                        event_time_col: str | None = None,
                        exact_watermark: str = "1 hour",
                        query_name: str = "minhash_screen_sink",
                        available_now: bool = True) -> StreamingQuery:
    """Continuously land only never-seen-before documents.

    Each epoch: signature pass over the batch → screen against epochs
    ``< N`` (estimated Jaccard ≥ ``threshold`` flags a near-dup) →
    optional in-batch keep-min-id self-dedup → survivors overwrite
    ``<out_dir>/epoch=N``, survivors' signatures overwrite
    ``<store_dir>/epoch=N``. Read the accumulated clean corpus with
    ``spark.read.parquet(out_dir)`` (epoch is a partition column).

    ``exact_dedup_keys`` (with ``event_time_col``) composes a
    :func:`watermark_exact_screen` UPSTREAM of the near-dup screen:
    at-least-once re-deliveries under the same key are dropped with
    watermark-bounded state before they pay a signature pass — see
    that function for the semantics and the oracle-gating note."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})")
    if exact_dedup_keys is not None:
        if event_time_col is None:
            raise ValueError("exact_dedup_keys requires event_time_col "
                             "(watermarks are event-time-bounded)")
        stream_df = watermark_exact_screen(
            stream_df, key_cols=exact_dedup_keys,
            event_time_col=event_time_col, watermark=exact_watermark)

    def _screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _truncate_stale_epochs(spark, (store_dir, out_dir), batch_id)
        _guard_sink_meta(spark, store_dir,
                         {"num_hashes": num_hashes, "bands": bands,
                          "shingle_n": shingle_n, "seed": seed},
                         batch_id)
        sigs = banded_signatures(
            batch_df, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            seed=seed)
        prior = [e for e in _epochs(spark, store_dir) if e < batch_id]
        est = (F.size(F.filter(
            F.zip_with("__sa", "__sb", lambda x, y: x == y),
            lambda m: m)) / F.lit(float(num_hashes)))
        batch = batch_df
        if prior:
            known = spark.read.option("basePath", store_dir) \
                .parquet(*[_epoch_path(store_dir, e) for e in prior])
            hits = (sigs.alias("n")
                    .join(known.alias("k"),
                          (F.col("n.band_key") == F.col("k.band_key"))
                          & (F.col("n.id") != F.col("k.id")))
                    .select(F.col("n.id").alias("__nid"),
                            F.col("k.id").alias("__kid"),
                            F.col("n.sig").alias("__sa"),
                            F.col("k.sig").alias("__sb"))
                    .dropDuplicates(["__nid", "__kid"])
                    .withColumn("__est", est)
                    .filter(F.col("__est") >= threshold)
                    .select(F.col("__nid").alias(id_col)).distinct())
            batch = batch.join(hits, id_col, "left_anti")
        if dedup_within_batch:
            # banded self-join over the batch's signatures, keep min id
            # (deterministic under replay — no arrival-order dependence)
            surv_sigs = sigs.join(
                batch.select(F.col(id_col).alias("id")).distinct(), "id")
            dup = (surv_sigs.alias("a")
                   .join(surv_sigs.alias("b"),
                         (F.col("a.band_key") == F.col("b.band_key"))
                         & (F.col("a.id") > F.col("b.id")))
                   .select(F.col("a.id").alias("__aid"),
                           F.col("b.id").alias("__bid"),
                           F.col("a.sig").alias("__sa"),
                           F.col("b.sig").alias("__sb"))
                   .dropDuplicates(["__aid", "__bid"])
                   .withColumn("__est", est)
                   .filter(F.col("__est") >= threshold)
                   .select(F.col("__aid").alias(id_col)).distinct())
            batch = batch.join(dup, id_col, "left_anti")
        batch.write.mode("overwrite").parquet(
            _epoch_path(out_dir, batch_id))
        sigs.join(batch.select(F.col(id_col).alias("id")).distinct(),
                  "id") \
            .write.mode("overwrite").parquet(
            _epoch_path(store_dir, batch_id))

    writer = (stream_df.writeStream.foreachBatch(_screen)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def embedding_screen_sink(stream_df: DataFrame, *, store_dir: str,
                          out_dir: str, checkpoint_dir: str, dim: int,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.9, tables: int = 8,
                          bits: int = 8, seed: int = 42,
                          planes_mode: str = "random",
                          dedup_within_batch: bool = True,
                          exact_dedup_keys: "str | list[str] | None" = None,
                          event_time_col: str | None = None,
                          exact_watermark: str = "1 hour",
                          query_name: str = "embedding_screen_sink",
                          available_now: bool = True) -> StreamingQuery:
    """Continuously land only never-seen-before EMBEDDINGS — the
    cosine analog of :func:`minhash_screen_sink`, sharing its
    replay-safe epoch discipline: epoch ``N``'s state (sign-LSH folded
    bucket keys + fp16 codes, the ``EmbeddingStore`` layout) overwrites
    ``<store_dir>/epoch=N``, the screen reads only epochs ``< N``, and
    a re-delivered batch recomputes identical outputs.

    Screening scores cos(batch vector, decoded prior code) — exact on
    the batch side, fp16-rounded on the history side. In-batch
    near-dups ride one additional bucket self-join (keep min id).
    ``exact_dedup_keys`` (with ``event_time_col``) composes a
    :func:`watermark_exact_screen` upstream, as on the minhash sink."""
    from faisssearcher_spark.functions import metrics as M
    from faisssearcher_spark.functions.vector import (dequantize_f16,
                                                      quantize_f16)
    from faisssearcher_spark.operators.dedup import lsh_bucket_rows

    if not -1.0 <= threshold <= 1.0:
        raise ValueError(f"threshold must be in [-1, 1], got {threshold}")
    if dim < 1 or tables < 1 or bits < 1:
        raise ValueError("dim, tables and bits must all be >= 1")
    if exact_dedup_keys is not None:
        if event_time_col is None:
            raise ValueError("exact_dedup_keys requires event_time_col "
                             "(watermarks are event-time-bounded)")
        stream_df = watermark_exact_screen(
            stream_df, key_cols=exact_dedup_keys,
            event_time_col=event_time_col, watermark=exact_watermark)

    def _rows(batch_df: DataFrame) -> DataFrame:
        # the EmbeddingStore commit layout (operators/incremental.py
        # _bucket_code_rows): code rides the bucket projection as a
        # payload column, dim declared so no per-micro-batch probe job
        src = batch_df.select(F.col(id_col).alias("id"),
                              F.col(vec_col).alias("__v"),
                              quantize_f16(vec_col).alias("code"))
        buckets = lsh_bucket_rows(
            src, id_col="id", vec_col="__v", tables=tables,
            bits=bits, seed=seed, dim=dim, planes_mode=planes_mode,
            probe_dim=False, payload=["code"])
        return buckets.select(
            "id", F.xxhash64("t", "bucket").alias("bucket_key"), "code")

    def _screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _truncate_stale_epochs(spark, (store_dir, out_dir), batch_id)
        _guard_sink_meta(spark, store_dir,
                         {"dim": dim, "tables": tables, "bits": bits,
                          "seed": seed, "planes_mode": planes_mode,
                          "codec": "f16"}, batch_id)
        rows = _rows(batch_df)
        vecs = batch_df.select(F.col(id_col).alias("__vid"),
                               F.col(vec_col).alias("__nv"))
        prior = [e for e in _epochs(spark, store_dir) if e < batch_id]
        batch = batch_df
        if prior:
            known = spark.read.option("basePath", store_dir) \
                .parquet(*[_epoch_path(store_dir, e) for e in prior])
            hits = (rows.alias("n")
                    .join(known.alias("k"),
                          (F.col("n.bucket_key") == F.col("k.bucket_key"))
                          & (F.col("n.id") != F.col("k.id")))
                    .select(F.col("n.id").alias("__vid"),
                            F.col("k.id").alias("__kid"),
                            F.col("k.code").alias("__kc"))
                    .dropDuplicates(["__vid", "__kid"])
                    .join(vecs, "__vid")
                    .withColumn("__cos",
                                M.cosine(F.col("__nv"),
                                         dequantize_f16("__kc")))
                    .filter(F.col("__cos") >= threshold)
                    .select(F.col("__vid").alias(id_col)).distinct())
            batch = batch.join(hits, id_col, "left_anti")
        if dedup_within_batch:
            surv = rows.join(
                batch.select(F.col(id_col).alias("id")).distinct(), "id")
            dup = (surv.alias("a")
                   .join(surv.alias("b"),
                         (F.col("a.bucket_key") == F.col("b.bucket_key"))
                         & (F.col("a.id") > F.col("b.id")))
                   .select(F.col("a.id").alias("__vid"),
                           F.col("b.id").alias("__bid"),
                           F.col("b.code").alias("__kc"))
                   .dropDuplicates(["__vid", "__bid"])
                   .join(vecs, "__vid")
                   .withColumn("__cos",
                               M.cosine(F.col("__nv"),
                                        dequantize_f16("__kc")))
                   .filter(F.col("__cos") >= threshold)
                   .select(F.col("__vid").alias(id_col)).distinct())
            batch = batch.join(dup, id_col, "left_anti")
        batch.write.mode("overwrite").parquet(
            _epoch_path(out_dir, batch_id))
        rows.join(batch.select(F.col(id_col).alias("id")).distinct(),
                  "id") \
            .write.mode("overwrite").parquet(
            _epoch_path(store_dir, batch_id))

    writer = (stream_df.writeStream.foreachBatch(_screen)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def fingerprint_screen_sink(stream_df: DataFrame, *, store_dir: str,
                            out_dir: str, checkpoint_dir: str,
                            id_col: str = "id", fp_col: str = "fp",
                            bits: int = 64, max_hamming: int = 3,
                            dedup_within_batch: bool = True,
                            exact_dedup_keys: "str | list[str] | None" = None,
                            event_time_col: str | None = None,
                            exact_watermark: str = "1 hour",
                            query_name: str = "fingerprint_screen_sink",
                            available_now: bool = True) -> StreamingQuery:
    """Continuously land only never-seen-before FINGERPRINTS — the
    Hamming analog of :func:`minhash_screen_sink` for the engine's
    64-bit perceptual/similarity prints (SimHash docs, dHash images,
    audio prints, per-frame video hashes), sharing the replay-safe
    epoch discipline: epoch ``N``'s banded state (the
    ``FingerprintStore`` layout — maximal-width pigeonhole bands
    folded into one xxhash64 ``band_key``) overwrites
    ``<store_dir>/epoch=N``, the screen reads only epochs ``< N``,
    and a re-delivered batch recomputes identical outputs. In-batch
    near-dups ride one banded self-join (keep min id).
    ``exact_dedup_keys`` composes a :func:`watermark_exact_screen`
    upstream, as on the other sinks."""
    from faisssearcher_spark.operators.dedup import hamming_band_rows

    if not 1 <= bits <= 64:
        raise ValueError(f"bits must be in [1, 64]; got {bits}")
    if not 0 <= max_hamming < bits:
        raise ValueError(
            f"max_hamming must be in [0, bits); got {max_hamming}")
    if exact_dedup_keys is not None:
        if event_time_col is None:
            raise ValueError("exact_dedup_keys requires event_time_col "
                             "(watermarks are event-time-bounded)")
        stream_df = watermark_exact_screen(
            stream_df, key_cols=exact_dedup_keys,
            event_time_col=event_time_col, watermark=exact_watermark)

    def _rows(batch_df: DataFrame) -> DataFrame:
        # the SHARED banding kernel — streamed state must stay
        # bit-identical to FingerprintStore state
        return hamming_band_rows(batch_df, id_col=id_col, fp_col=fp_col,
                                 bits=bits, max_hamming=max_hamming,
                                 fold_key=True)

    def _hits(new_rows: DataFrame, state: DataFrame,
              self_join: bool) -> DataFrame:
        cond = ((F.col("n.band_key") == F.col("k.band_key"))
                & ((F.col("n.id") > F.col("k.id")) if self_join
                   else (F.col("n.id") != F.col("k.id"))))
        return (new_rows.alias("n").join(state.alias("k"), cond)
                .select(F.col("n.id").alias("__nid"),
                        F.col("k.id").alias("__kid"),
                        F.bit_count(F.col("n.fp")
                                    .bitwiseXOR(F.col("k.fp")))
                        .alias("__h"))
                .filter(F.col("__h") <= max_hamming)
                .select(F.col("__nid").alias(id_col)).distinct())

    def _screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _truncate_stale_epochs(spark, (store_dir, out_dir), batch_id)
        _guard_sink_meta(spark, store_dir,
                         {"bits": bits, "max_hamming": max_hamming},
                         batch_id)
        rows = _rows(batch_df)
        prior = [e for e in _epochs(spark, store_dir) if e < batch_id]
        batch = batch_df
        if prior:
            known = spark.read.option("basePath", store_dir) \
                .parquet(*[_epoch_path(store_dir, e) for e in prior])
            batch = batch.join(_hits(rows, known, self_join=False),
                               id_col, "left_anti")
        if dedup_within_batch:
            surv = rows.join(
                batch.select(F.col(id_col).alias("id")).distinct(), "id")
            batch = batch.join(_hits(surv, surv, self_join=True),
                               id_col, "left_anti")
        batch.write.mode("overwrite").parquet(
            _epoch_path(out_dir, batch_id))
        rows.join(batch.select(F.col(id_col).alias("id")).distinct(),
                  "id") \
            .write.mode("overwrite").parquet(
            _epoch_path(store_dir, batch_id))

    writer = (stream_df.writeStream.foreachBatch(_screen)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
