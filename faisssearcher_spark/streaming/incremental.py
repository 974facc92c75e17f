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

from typing import Iterator  # noqa: F401  (doc parity with siblings)

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from faisssearcher_spark.operators.incremental import banded_signatures
from faisssearcher_spark.streaming.sketches import (_epoch_path, _epochs,
                                                    _fs_path)

__all__ = ["minhash_screen_sink"]


def minhash_screen_sink(stream_df: DataFrame, *, store_dir: str,
                        out_dir: str, checkpoint_dir: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        threshold: float = 0.7, num_hashes: int = 16,
                        bands: int = 4, shingle_n: int | None = 3,
                        seed: int = 42,
                        dedup_within_batch: bool = True,
                        query_name: str = "minhash_screen_sink",
                        available_now: bool = True) -> StreamingQuery:
    """Continuously land only never-seen-before documents.

    Each epoch: signature pass over the batch → screen against epochs
    ``< N`` (estimated Jaccard ≥ ``threshold`` flags a near-dup) →
    optional in-batch keep-min-id self-dedup → survivors overwrite
    ``<out_dir>/epoch=N``, survivors' signatures overwrite
    ``<store_dir>/epoch=N``. Read the accumulated clean corpus with
    ``spark.read.parquet(out_dir)`` (epoch is a partition column)."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})")

    def _screen(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id == 0:
            # fresh/reset checkpoint: every input re-delivers; surviving
            # epoch dirs are stale state from a previous run (the
            # streaming/sketches batch-0 truncation discipline)
            for root in (store_dir, out_dir):
                fs, _ = _fs_path(spark, root)
                jpath = spark._jvm.org.apache.hadoop.fs.Path
                for e in _epochs(spark, root):
                    fs.delete(jpath(_epoch_path(root, e)), True)
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
