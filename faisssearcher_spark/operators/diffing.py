"""Corpus version diffing — what changed between two dataset snapshots.

Training-data pipelines re-land corpora continuously; the operational
questions ("what did the refresh add / remove / rewrite?", "did the
cleaning job touch anything it shouldn't?") reduce to a key-aligned
diff of content fingerprints. Everything here shuffles fingerprints
(16-byte md5), never documents: the diff of two 100 TB snapshots moves
O(rows × 50 bytes).

``corpus_diff`` emits one row per key with a status; ``diff_summary``
is the one-line report. Statuses:

- ``added``      — key only in ``new``
- ``removed``    — key only in ``old``
- ``changed``    — key in both, fingerprints differ
- ``unchanged``  — key in both, fingerprints equal
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fp(text_col: str) -> Column:
    return F.md5(F.coalesce(F.col(text_col), F.lit("\x00null")))


def corpus_diff(old: DataFrame, new: DataFrame, *, key_col: str = "doc_id",
                text_col: str = "text",
                fingerprint_col: str | None = None) -> DataFrame:
    """Key-aligned snapshot diff: ``(key, status, old_fp, new_fp)``.

    ``fingerprint_col`` names a precomputed fingerprint column (reuse
    `functions.text.fingerprint` / `normalize_text` hashes when
    whitespace-insensitive comparison is wanted); by default the md5 of
    the raw text stands in. NULL fingerprints coalesce to a sentinel on
    both sides — a null fingerprint must mean "present with null
    content", never "absent" (status 'added'/'removed' is decided by key
    presence alone). Keys must be unique per snapshot — duplicate keys
    make "the" fingerprint of a key ambiguous — enforced LAZILY inside
    the plan (a per-key count rides the aggregation each side already
    needs; a duplicate key raises at execution time, so building the
    frame stays side-effect-free and each snapshot is scanned once).

    Plan: project to (key, fp), one hash aggregate per side (the
    duplicate guard), one full-outer shuffle join on the key, a CASE
    over null-ness. AQE handles skew; nothing document-sized moves.
    """
    fp = (F.col(fingerprint_col) if fingerprint_col is not None
          else _fp(text_col))
    fp = F.coalesce(fp.cast("string"), F.lit("\x00null-fp"))

    def _side(df: DataFrame, side: str, out: str) -> DataFrame:
        dup_msg = F.concat(
            F.lit(f"corpus_diff: duplicate {key_col!r} key in the {side} "
                  f"snapshot (key="), F.col("key").cast("string"),
            F.lit(") — fingerprints would be ambiguous; dedup first "
                  "(operators/dedup.dedup_exact)"))
        return (df.select(F.col(key_col).alias("key"), fp.alias(out))
                .groupBy("key")
                .agg(F.count("*").alias("__n"), F.min(out).alias(out))
                .select("key",
                        F.when(F.col("__n") > 1, F.raise_error(dup_msg))
                        .otherwise(F.col(out)).alias(out)))

    o = _side(old, "old", "old_fp")
    n = _side(new, "new", "new_fp")
    joined = o.join(n, "key", "full_outer")
    status = (F.when(F.col("old_fp").isNull(), "added")
              .when(F.col("new_fp").isNull(), "removed")
              .when(F.col("old_fp") == F.col("new_fp"), "unchanged")
              .otherwise("changed"))
    return joined.select("key", status.alias("status"), "old_fp", "new_fp")


def diff_summary(diff: DataFrame) -> DataFrame:
    """Status counts — one aggregate over the diff frame."""
    return (diff.groupBy("status").agg(F.count("*").alias("n"))
            .orderBy("status"))


def drift_report(old: DataFrame, new: DataFrame, cols: "list[str]", *,
                 buckets: int = 10,
                 edges: "dict[str, list[float]] | None" = None) -> DataFrame:
    """Population Stability Index per numeric column — the standard
    "did the refresh change the data's SHAPE" drift metric between two
    snapshot versions (PSI < 0.1 stable; 0.1–0.25 moderate; > 0.25 the
    distribution moved).

    Method: bucket edges are the OLD snapshot's ``buckets``-quantiles
    (one approxQuantile sketch pass, driver receives only the edges);
    both snapshots then count rows per fixed bucket (one aggregate
    each, map-side combined), and PSI = Σ (p_new − p_old)·ln(p_new/p_old)
    over buckets, with the usual 1e-6 floor so empty buckets do not
    produce infinities. Returns one row per column:
    ``(column, psi, n_old, n_new)``.

    Only bucket counts ever reach the driver — O(cols × buckets)
    numbers regardless of snapshot size. NULLs are excluded from both
    distributions (report them via expect.completeness instead).

    ``edges`` overrides the approxQuantile sketch with explicit
    per-column ascending bucket edges (len = buckets − 1 each) — for
    reproducible cross-engine checks (the sketch is not replicable in
    SQL) or domain-fixed bucketing; the PSI math is identical.
    """
    import math

    if not cols:
        raise ValueError("cols must be non-empty")
    if buckets < 2:
        raise ValueError("buckets must be >= 2")
    qs = [i / buckets for i in range(1, buckets)]
    # THREE jobs total regardless of len(cols): one multi-column
    # approxQuantile sketch over the old snapshot, then one aggregate
    # per frame folding every column's bucket counts into a single row
    # (cols × buckets conditional sums — driver loops over columns
    # would serialize a full scan per column per frame).
    casted = {frame: frame.select(*[F.col(c).cast("double").alias(c)
                                    for c in cols])
              for frame in (old, new)}
    if edges is not None:
        missing = [c for c in cols if c not in edges]
        if missing:
            raise ValueError(f"edges missing columns: {missing}")
        bad = [c for c in cols if len(edges[c]) != buckets - 1]
        if bad:
            raise ValueError(
                f"edges must have buckets-1 = {buckets - 1} values; "
                f"wrong length for: {bad}")
        edges_list = [[float(e) for e in edges[c]] for c in cols]
    else:
        edges_list = casted[old].approxQuantile(cols, qs, 0.001)

    def _fractions(df: DataFrame):
        aggs = []
        for ci, c in enumerate(cols):
            v = F.col(c)
            b = F.lit(0)
            for i, e in enumerate(edges_list[ci]):
                b = F.when(v > e, i + 1).otherwise(b)
            for i in range(len(edges_list[ci]) + 1):
                aggs.append(F.sum(F.when(v.isNotNull() & (b == i), 1)
                                  .otherwise(0)).alias(f"c{ci}_b{i}"))
            aggs.append(F.count(c).alias(f"c{ci}_n"))
        row = df.agg(*aggs).first()
        out = []
        for ci in range(len(cols)):
            total = int(row[f"c{ci}_n"] or 0)
            nb = len(edges_list[ci]) + 1
            frac = [(row[f"c{ci}_b{i}"] or 0) / total if total else 0.0
                    for i in range(nb)]
            out.append((frac, total))
        return out

    old_f = _fractions(casted[old])
    new_f = _fractions(casted[new])
    rows = []
    for ci, c in enumerate(cols):
        po, n_old = old_f[ci]
        pn, n_new = new_f[ci]
        psi = sum((b - a) * math.log(max(b, 1e-6) / max(a, 1e-6))
                  for a, b in zip(po, pn))
        rows.append((c, round(psi, 6), n_old, n_new))
    spark = old.sparkSession
    return spark.createDataFrame(
        rows, "column string, psi double, n_old long, n_new long")
