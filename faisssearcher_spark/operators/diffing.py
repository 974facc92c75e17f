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
    the raw text stands in. Keys must be unique per snapshot — duplicate
    keys make "the" fingerprint of a key ambiguous — and are validated
    with a cheap count-vs-distinct guard (one aggregate per side, far
    cheaper than a wrong diff).

    Plan: project to (key, fp) on both sides, one full-outer shuffle
    join on the key, a CASE over null-ness. AQE handles skew; nothing
    document-sized moves.
    """
    fp = (F.col(fingerprint_col) if fingerprint_col is not None
          else _fp(text_col))
    o = old.select(F.col(key_col).alias("key"), fp.alias("old_fp"))
    n = new.select(F.col(key_col).alias("key"), fp.alias("new_fp"))
    for side, frame in (("old", o), ("new", n)):
        row = frame.agg(
            F.count("key").alias("n"),
            F.count_distinct(F.col("key")).alias("d")).first()
        if row["n"] != row["d"]:
            raise ValueError(
                f"{side} snapshot has {row['n'] - row['d']} duplicate "
                f"{key_col!r} keys — fingerprints would be ambiguous; "
                f"dedup first (operators/dedup.dedup_exact)")
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
