"""Multi-dimensional data layout (Z-order clustering) for scan pruning.

Beyond-reference, north-star surface: at 100 TB the dominant cost of
every selective query is the parquet scan, and parquet prunes row
groups/files with min-max statistics. A table sorted by ONE column
prunes filters on that column only; interleaving the bits of several
columns' rank-buckets (a Morton/Z-order curve — the same layout
Delta Lake's ``OPTIMIZE ZORDER BY`` and Databricks' liquid clustering
produce) gives every participating column ~n^(1/k) locality per file,
so min-max pruning works for ALL of them at once.

Scale shape: one ``approxQuantile`` pass per column (a single-pass,
mergeable Greenwald-Khanna sketch — driver state is just the 2^bits
boundary list), one scan projecting the z-key (a codegen'd binary-
search CASE tree + integer bit ops — no Python, no shuffle), then ONE
``repartitionByRange`` on the key (the same sampled range shuffle a
global sort costs) with an in-partition sort. That is exactly the
cost profile of a compaction/OPTIMIZE maintenance job; readers never
pay anything — they just prune more.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double",
            "decimal", "date", "timestamp", "timestamp_ntz")


def _rank_bucket_expr(col: Column, boundaries: list[float],
                      n_buckets: int) -> Column:
    """Bucket ``col`` into [0, n_buckets) by binary-searching the sampled
    quantile ``boundaries`` (len n_buckets-1, ascending): a balanced tree
    of nested CASE WHEN — O(bits) comparisons per row, plain codegen'd
    integer/double compares (a higher-order-function fold over the
    boundary array would run interpreted and O(n_buckets) per row,
    NOTES.md). NULLs land in bucket 0, matching NULLS FIRST sort order.
    """
    def tree(lo: int, hi: int) -> Column:
        # bucket index range [lo, hi]; boundaries[b-1] is the lower edge
        # of bucket b
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return (F.when(col >= F.lit(boundaries[mid - 1]), tree(mid, hi))
                .otherwise(tree(lo, mid - 1)))

    return F.when(col.isNull(), F.lit(0)).otherwise(tree(0, n_buckets - 1))


def _bucket_exprs(df: DataFrame, cols: Sequence[str], *, bits: int,
                  relative_error: float,
                  boundaries: "dict[str, list[float]] | None",
                  out_col: str, kind: str) -> "list[Column]":
    """Shared rank-bucketing front half of every layout key: validation,
    temporal→double casting, the approxQuantile sketch (or explicit
    ``boundaries``), and one codegen'd CASE-tree bucket expression per
    column, each in [0, 2**bits)."""
    if not cols:
        raise ValueError(f"{kind}_key needs at least one column")
    if not 1 <= bits * len(cols) <= 62:
        raise ValueError(
            f"bits*len(cols) must be in [1, 62] to fit a long, got "
            f"{bits}*{len(cols)}")
    if bits > 12:
        raise ValueError(
            f"bits={bits} would build a 2^{bits}-node expression tree; "
            f"use <= 12 (pruning saturates far earlier)")
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists")
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        if not dt.startswith(_NUMERIC):
            raise ValueError(
                f"{kind} column {c!r} has type {dt}: rank-bucketing needs "
                f"an ordered numeric/temporal type (hashing a string "
                f"would destroy the locality the layout exists for)")
    n_buckets = 1 << bits
    # temporal -> numeric for the quantile sketch + compares. DATE does
    # not cast to double directly (silently NULL outside ANSI mode —
    # every row would bucket to 0); route it through timestamp, which
    # casts to epoch seconds.
    casted = {}
    for c in cols:
        dt = df.schema[c].dataType.simpleString()
        col = F.col(c).cast("timestamp") if dt == "date" else F.col(c)
        casted[c] = col.cast("double")
    if boundaries is not None:
        missing = [c for c in cols if c not in boundaries]
        if missing:
            raise ValueError(f"boundaries missing columns: {missing}")
        bad = [c for c in cols if len(boundaries[c]) != n_buckets - 1]
        if bad:
            raise ValueError(
                f"boundaries must have 2**bits-1 = {n_buckets - 1} "
                f"values; wrong length for: {bad}")
        all_bnds = [[float(x) for x in boundaries[c]] for c in cols]
    else:
        probe = df.select(*[casted[c].alias(f"__zq_{i}")
                            for i, c in enumerate(cols)])
        quantiles = [float(q) / n_buckets for q in range(1, n_buckets)]
        all_bnds = probe.approxQuantile(
            [f"__zq_{i}" for i in range(len(cols))], quantiles,
            relative_error)
    buckets = []
    for c, bnds in zip(cols, all_bnds):
        if not bnds:   # all-NULL column: every row buckets to 0
            buckets.append(F.lit(0))
        else:
            buckets.append(_rank_bucket_expr(casted[c], bnds, n_buckets))
    return buckets


def zorder_key(df: DataFrame, cols: Sequence[str], *, bits: int = 8,
               out_col: str = "__zorder",
               relative_error: float = 0.001,
               boundaries: "dict[str, list[float]] | None" = None) -> DataFrame:
    """Append the Z-order (Morton) key of ``cols``: each column is
    rank-bucketed into ``2**bits`` quantile buckets (skew-robust — equal
    ROW mass per bucket, unlike value-range bucketing) and the bucket
    bits are interleaved into one long. Rows close on the Z-curve are
    close in EVERY participating column, which is what turns min-max
    footer stats into multi-column file pruning.

    ``bits`` is per-column; ``bits * len(cols)`` must fit a long (≤ 62)
    and the CASE tree grows as 2^bits nodes per column, so keep bits in
    the default 6-10 range — pruning benefits saturate once
    2^bits ≫ number of output files anyway.

    ``boundaries`` overrides the approxQuantile sketch with explicit
    per-column ascending bucket edges (len = 2**bits − 1 each) — for
    reproducible cross-engine checks (the sketch is not replicable in
    SQL; the drift_report ``edges`` pattern) or domain-fixed bucketing;
    key construction is identical.
    """
    buckets = _bucket_exprs(df, cols, bits=bits,
                            relative_error=relative_error,
                            boundaries=boundaries, out_col=out_col,
                            kind="zorder")
    ncols = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * ncols + j))
    return df.withColumn(out_col, z)


def zorder_layout(df: DataFrame, cols: Sequence[str], *,
                  n_files: int, bits: int = 8,
                  relative_error: float = 0.001) -> DataFrame:
    """Cluster ``df`` on the Z-curve of ``cols`` and split it into
    ``n_files`` range partitions, sorted within each — write the result
    with ``.write.parquet(...)`` and every file's min-max footer spans
    only its Z-range, i.e. a ~n_files^(-1/len(cols)) slice of EACH
    column. The helper column is dropped; the partitioning and order
    survive the write.

    This is the maintenance-job half of the exactly-once sink pattern
    (``streaming/sinks.compact_sink``): run it on cold data on a
    schedule, point readers at the result.
    """
    keyed = zorder_key(df, cols, bits=bits, relative_error=relative_error)
    return (keyed.repartitionByRange(n_files, F.col("__zorder"))
            .sortWithinPartitions("__zorder")
            .drop("__zorder"))


def hilbert_key(df: DataFrame, cols: Sequence[str], *, bits: int = 8,
                out_col: str = "__hilbert",
                relative_error: float = 0.001,
                boundaries: "dict[str, list[float]] | None" = None
                ) -> DataFrame:
    """Append the 2-D Hilbert-curve key of exactly two columns — the
    strictly-better-locality sibling of :func:`zorder_key` (the layout
    Apache Iceberg and Delta's newer clustering offer next to Z-order):
    consecutive Hilbert cells are always grid-ADJACENT (Manhattan
    distance 1), while the Z-curve jumps across the grid at every power
    of two, so Hilbert files cover tighter min-max rectangles at the
    same file count — measurably smaller per-file spans on uniform data
    (pinned in tests/test_layout.py).

    Same front half as Z-order: quantile rank-buckets per column (skew-
    robust; ``boundaries`` overrides the sketch). The bucket pair then
    walks the standard xy→d loop (one step per bit, MSB first; the
    (3·rx)^ry quadrant term plus the reflect-and-swap rotation). Each
    step's (x, y, d) is materialized behind a one-element
    ``explode(array(struct(...)))`` Generate barrier — the rotation
    references x and y several times, so inlining the ``bits`` steps
    (CollapseProject) would grow the expression tree ~4^bits; behind
    barriers the plan stays linear in ``bits`` (the engine's standard
    HOF-CSE discipline, NOTES.md). Pure Catalyst: no Python, no
    shuffle — the same one-pass key projection cost as the Z-key.

    Only 2-D: the quadrant/rotation algebra is specific to two
    dimensions (d-dimensional Hilbert needs the Butz algorithm's state
    tables); for 3+ columns use :func:`zorder_key`, whose locality gap
    vs Hilbert narrows as dimensions grow anyway.
    """
    if len(cols) != 2:
        raise ValueError(
            f"hilbert_key is 2-D (got {len(cols)} columns) — use "
            f"zorder_key for other dimensionalities")
    taken = [c for c in ("__hx", "__hy", "__hd", "__hstep")
             if c in df.columns]
    if taken:
        raise ValueError(f"hilbert_key needs scratch columns {taken} — "
                         f"rename or drop them first")
    bx, by = _bucket_exprs(df, cols, bits=bits,
                           relative_error=relative_error,
                           boundaries=boundaries, out_col=out_col,
                           kind="hilbert")
    cur = df.select("*", bx.cast("long").alias("__hx"),
                    by.cast("long").alias("__hy"),
                    F.lit(0).cast("long").alias("__hd"))

    def step(x, y, d, i):
        s = 1 << i
        rx = F.when(x.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        ry = F.when(y.bitwiseAND(F.lit(s)) > 0, F.lit(1)).otherwise(F.lit(0))
        nd = d + F.lit(s * s).cast("long") * \
            (rx * 3).bitwiseXOR(ry).cast("long")
        # rot: if ry==0, reflect by s-1 when rx==1, then swap x<->y
        nx = F.when(ry == 1, x).otherwise(
            F.when(rx == 1, F.lit(s - 1) - y).otherwise(y))
        ny = F.when(ry == 1, y).otherwise(
            F.when(rx == 1, F.lit(s - 1) - x).otherwise(x))
        return nx, ny, nd

    # TWO walk steps inline per Generate barrier: each step references
    # the previous step's x/y ~4 times, so k inlined steps grow the
    # expression tree ~4^k. MEASURED on persisted sf0.1 lineitem
    # (best-of-3 per variant, same session): k=1 4.88 s, k=2 4.88 s,
    # k=3 8.93 s — k=2 halves the full-row Generate copies for free,
    # k=3's ~64-node trees already double the cost. Don't raise it.
    levels = list(reversed(range(bits)))
    for chunk_start in range(0, bits, 2):
        x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
        for i in levels[chunk_start:chunk_start + 2]:
            x, y, d = step(x, y, d, i)
        cur = (cur.select("*", F.explode(F.array(F.struct(
                   x.alias("x"), y.alias("y"), d.alias("d"))))
                   .alias("__hstep"))
               .drop("__hx", "__hy", "__hd")
               .withColumn("__hx", F.col("__hstep.x"))
               .withColumn("__hy", F.col("__hstep.y"))
               .withColumn("__hd", F.col("__hstep.d"))
               .drop("__hstep"))
    return (cur.drop("__hx", "__hy")
            .withColumnRenamed("__hd", out_col))


def hilbert_layout(df: DataFrame, cols: Sequence[str], *,
                   n_files: int, bits: int = 8,
                   relative_error: float = 0.001) -> DataFrame:
    """Cluster ``df`` along the Hilbert curve of two columns and split
    into ``n_files`` range partitions sorted within each — the
    :func:`zorder_layout` maintenance job with the tighter curve."""
    keyed = hilbert_key(df, cols, bits=bits, relative_error=relative_error)
    return (keyed.repartitionByRange(n_files, F.col("__hilbert"))
            .sortWithinPartitions("__hilbert")
            .drop("__hilbert"))
