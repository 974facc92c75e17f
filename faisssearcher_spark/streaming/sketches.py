"""Incrementally-maintained sketch state for streams.

The batch half of the sketch story (operators/sketches.py) materializes
per-group HLL sketches once and serves rollups from them; this module
keeps that state CURRENT under a stream: each micro-batch's sketches are
UNIONED into the persisted state, so distinct-count dashboards read a
few-KB table that is always up to date, and the raw events are never
rescanned. Mergeability is exactly what makes this correct — per-batch
sketches union associatively, so arrival order and batching don't change
the state (unlike exact per-batch distinct counts, which cannot be
merged).

Replay safety follows the idempotent-sink pattern (streaming/sinks.py):
epoch ``N``'s state is a pure function of epoch ``N−1``'s state plus
batch ``N``, written by OVERWRITING ``<state_dir>/epoch=<N>`` — a
re-delivered batch recomputes byte-identical state over itself.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from faisssearcher_spark.operators.sketches import hll_sketches

_EPOCH_RE = re.compile(r"^epoch=(\d+)$")


def _fs_path(spark: SparkSession, uri: str):
    """(Hadoop FileSystem, Path) for any URI the session can reach —
    state listing/cleanup must go through the Hadoop FS API, not
    os.listdir: with a remote state_dir (s3://, hdfs://) the local-FS
    calls silently saw an empty directory, so every epoch dropped all
    prior contributions and batch-0 stale-state truncation no-op'd
    (r5 ADVICE #1)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path


def _epoch_path(state_dir: str, epoch: int) -> str:
    return state_dir.rstrip("/") + f"/epoch={epoch}"


def _epochs(spark: SparkSession, state_dir: str) -> list[int]:
    fs, path = _fs_path(spark, state_dir)
    if not fs.exists(path):
        return []
    out = []
    for status in fs.listStatus(path):
        m = _EPOCH_RE.match(status.getPath().getName())
        if m and status.isDirectory():
            out.append(int(m.group(1)))
    return sorted(out)


def _footer_columns(spark: SparkSession, path: str) -> "set | None":
    """Lower-cased column names from one parquet footer under ``path``
    — pyarrow directly on local paths (~ms; a spark.read.parquet
    footer inference measured ~0.4 s per call), falling back to a
    Spark read elsewhere; None when no footer is reachable (the
    compatibility check then passes — advisory, not load-bearing)."""
    import os

    local = path[7:] if path.startswith("file://") else path
    if os.path.isdir(local):
        try:
            import pyarrow.parquet as pq
            for name in sorted(os.listdir(local)):
                if name.endswith(".parquet"):
                    sch = pq.read_schema(os.path.join(local, name))
                    return {n.lower() for n in sch.names}
        except Exception:
            pass
    try:
        return {f.name.lower()
                for f in spark.read.parquet(path).schema}
    except Exception:
        return None


def _epoch_sink(stream_df: DataFrame, *, sketch_fn, merge_fn,
                state_dir: str, checkpoint_dir: str, query_name: str,
                available_now: bool) -> StreamingQuery:
    """THE shared epoch discipline behind every sketch sink — one copy
    of the replay-safety-critical plumbing (review catch: it was
    duplicated per sink), parameterized by how a micro-batch becomes a
    sketch table (``sketch_fn``) and how two sketch tables merge
    (``merge_fn``):

    - batch 0 means a fresh (or reset) checkpoint: every input file
      will be re-delivered, so any surviving epoch dirs are STALE
      state from a previous run — keeping them would let
      read_sketch_state return old data (a reset run can write fewer,
      lower-numbered epochs) and would double-count on merge.
      Truncate; the guarantee is "state matches THIS checkpoint's
      delivered input".
    - epoch N = merge(epoch N-1's state, sketch(batch N)), written by
      OVERWRITING ``epoch=<N>`` — a re-delivered batch recomputes
      byte-identical state over itself.
    """

    # one footer-schema compatibility check per STREAM (r13 ADVICE):
    # forcing new.schema onto every prior epoch skips footer inference,
    # but state persisted by an older library version with a different
    # sketch schema would be silently misread (missing columns become
    # nulls feeding merge_fn) — verify the first prior epoch actually
    # carries the expected columns, then keep the fast path
    checked: set = set()

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_id == 0:
            fs, _ = _fs_path(spark, state_dir)
            jpath = spark._jvm.org.apache.hadoop.fs.Path
            for e in _epochs(spark, state_dir):
                fs.delete(jpath(_epoch_path(state_dir, e)), True)
        new = sketch_fn(batch_df)
        prior = [e for e in _epochs(spark, state_dir) if e < batch_id]
        if prior:
            prev_path = _epoch_path(state_dir, prior[-1])
            spark.catalog.refreshByPath(prev_path)
            if not checked:
                footer = _footer_columns(spark, prev_path)
                want = {f.name.lower() for f in new.schema}
                if footer is not None and not want <= footer:
                    raise ValueError(
                        f"sketch state at {prev_path} is missing columns "
                        f"{sorted(want - footer)} (footer has "
                        f"{sorted(footer)}); the persisted state was "
                        "written with an incompatible sketch schema — "
                        "reset state_dir or migrate it")
                checked.add(True)
            # prior state has the sketch schema by construction (it was
            # written from this same merge) — pass it instead of paying
            # a footer-inference read per epoch (guide §1.2/#2: the
            # epoch loop's fixed costs multiply by epoch count)
            prev = spark.read.schema(new.schema).parquet(prev_path)
            merged = merge_fn(prev, new)
        else:
            merged = new
        (merged.write.mode("overwrite")
         .parquet(_epoch_path(state_dir, batch_id)))

    writer = (stream_df.writeStream.foreachBatch(_merge)
              .queryName(query_name)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hll_sketch_sink(stream_df: DataFrame, *, group_cols: Sequence[str],
                    value_col: str, state_dir: str, checkpoint_dir: str,
                    lg_k: int = 12,
                    query_name: str = "hll_sketch_sink",
                    available_now: bool = True) -> StreamingQuery:
    """Maintain per-group HLL sketch state under a stream.

    Each epoch: sketch the micro-batch (one aggregation of batch rows),
    union with the latest PRIOR epoch's state (a sketch-table-sized
    read — KBs, not the corpus), overwrite this epoch's directory (the
    :func:`_epoch_sink` replay discipline). Query the state any time
    with :func:`read_sketch_state` + ``operators.sketches.hll_rollup``.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    group_cols = list(group_cols)
    return _epoch_sink(
        stream_df,
        sketch_fn=lambda b: hll_sketches(b, group_cols, value_col,
                                         lg_k=lg_k),
        merge_fn=lambda prev, new: (
            prev.unionByName(new).groupBy(*group_cols)
            .agg(F.hll_union_agg("hll").alias("hll"))),
        state_dir=state_dir, checkpoint_dir=checkpoint_dir,
        query_name=query_name, available_now=available_now)


def read_sketch_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """The latest epoch's sketch table (``group_cols... + hll binary``).
    Old epochs stay on disk as recovery points; prune them like any
    checkpointed state once a retention window passes."""
    epochs = _epochs(spark, state_dir)
    if not epochs:
        raise FileNotFoundError(f"no sketch state under {state_dir!r}")
    path = _epoch_path(state_dir, epochs[-1])
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def cms_sketch_sink(stream_df: DataFrame, *, value_col: str,
                    state_dir: str, checkpoint_dir: str,
                    depth: int = 4, width: int = 1024,
                    salt: str = "cms",
                    query_name: str = "cms_sketch_sink",
                    available_now: bool = True) -> StreamingQuery:
    """Maintain a count-min sketch under a stream — the frequency
    (heavy-hitter) sibling of :func:`hll_sketch_sink`: HLL answers
    "how many DISTINCT", CMS answers "how often is THIS one", both
    from a fixed-size state table the raw stream never has to be
    rescanned for.

    Mergeability here is CELL ADDITIVITY: a CMS over a union of
    streams is the cell-wise SUM of the per-stream sketches (counts
    add; the bucket hash is content-only), so each epoch sums the
    micro-batch's cell table (operators/sketches.cms_table — ≤
    depth×width rows leave each partition no matter the batch size)
    into the prior epoch's state and overwrites ``epoch=<N>``. The
    final state is therefore bit-identical to ONE batch
    ``cms_table`` over all delivered rows, regardless of arrival
    order or batching — the exact stream≡batch parity the gate leg
    hashes. Replay safety and batch-0 stale-state truncation are the
    shared :func:`_epoch_sink` discipline.

    Query the state any time with :func:`read_sketch_state` +
    ``operators.sketches.cms_lookup`` (same depth/width/salt).
    """
    from faisssearcher_spark.operators.sketches import cms_table

    return _epoch_sink(
        stream_df,
        sketch_fn=lambda b: cms_table(b, value_col, depth=depth,
                                      width=width, salt=salt),
        merge_fn=lambda prev, new: (
            prev.unionByName(new).groupBy("row_idx", "bucket")
            .agg(F.sum("cnt").alias("cnt"))),
        state_dir=state_dir, checkpoint_dir=checkpoint_dir,
        query_name=query_name, available_now=available_now)
