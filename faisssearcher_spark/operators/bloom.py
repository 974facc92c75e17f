"""Approximate set membership (Bloom filter) for incremental curation.

The incremental-dedup problem at 100 TB: each new crawl batch must be
checked against *everything already ingested*. A join against the full
history re-shuffles the history every batch; a Bloom filter reduces the
history to a few hundred MB of bits that BROADCAST, so screening a new
batch is one scan — no shuffle, no history re-read — at the price of a
bounded false-positive rate (never false negatives: ``filter_new`` may
drop a few genuinely-new rows, it never keeps a known one).

Spark's built-in ``bloom_filter_agg`` is not SQL-registered for users
(probed: UNRESOLVED_ROUTINE), and its JVM hash would be opaque to both
the Python side and the DuckDB oracle anyway. This implementation keeps
every hash **inside the Spark plan** (the Python side only indexes a
bitmap, so fit and check can never disagree on hashing):

- fit: k position expressions per key → explode → ``(pos >> 6)`` word
  grouping with a ``bit_or(1 << (pos & 63))`` aggregate — partial
  combine collapses duplicate bits map-side — and the ≤ m/64 non-zero
  words collect to a driver numpy bitmap that is then broadcast.
- check: the SAME k position expressions, then one vectorized
  pandas_udf tests all k bits against the broadcast bitmap per Arrow
  batch.

``hash_method``: ``"xxhash64"`` (default — one JVM hash per position,
the fast path) or ``"md5"`` (the engine's shared md5_int arithmetic,
replayable bit-for-bit in DuckDB — the oracle-gated path; same pattern
as ``embedding_cosine_pairs(lsh_impl=...)``). Membership decisions are
deterministic given the hash method, so even the *approximate* filter
is exactly oracle-checkable: DuckDB rebuilds the position set and
replays the k IN-tests.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from faisssearcher_spark.functions.text import md5_int

__all__ = ["BloomFilter", "fit_bloom", "bloom_position_exprs"]

#: driver bitmap cap — 2^33 bits = 1 GiB of driver/broadcast memory.
MAX_BITS = 1 << 33


def bloom_position_exprs(key_col: Column | str, *, n_bits: int,
                         n_hashes: int, seed: int,
                         hash_method: str) -> list[Column]:
    """The k bit positions of a key — pure Catalyst expressions, shared
    verbatim by fit and check (and mirrored by the registry oracle for
    ``hash_method="md5"``: ``('0x'||substring(md5('bloom<i>|<seed>|'||
    key),1,8))::BIGINT % n_bits``)."""
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    key = key.cast("string")
    if hash_method == "md5":
        return [
            F.pmod(md5_int(F.concat(F.lit(f"bloom{i}|{seed}|"), key)),
                   F.lit(n_bits))
            for i in range(n_hashes)]
    if hash_method == "xxhash64":
        return [F.pmod(F.xxhash64(F.lit(i), F.lit(seed), key),
                       F.lit(n_bits))
                for i in range(n_hashes)]
    raise ValueError(f"hash_method must be 'md5' or 'xxhash64', "
                     f"got {hash_method!r}")


class BloomFilter:
    """Fitted filter: a numpy uint64 bitmap plus the hash configuration.
    Build with :func:`fit_bloom` or :meth:`load`."""

    def __init__(self, words: np.ndarray, *, n_bits: int, n_hashes: int,
                 seed: int, hash_method: str, n_items: int):
        self.words = words
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.seed = seed
        self.hash_method = hash_method
        self.n_items = n_items
        self._bc = None  # lazy per-SparkContext broadcast

    # -- introspection ----------------------------------------------------

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())

    @property
    def fpp_estimate(self) -> float:
        """Actual false-positive probability from bit occupancy:
        (set/m)^k — tighter than the design fpp when underfilled."""
        return float((self.n_set_bits / self.n_bits) ** self.n_hashes)

    # -- membership -------------------------------------------------------

    def might_contain(self, key_col: Column | str) -> Column:
        """Boolean column: all k bits set (possible member / definite
        non-member). Hashing runs in the JVM plan; Python only gathers
        bits from the broadcast bitmap, one numpy gather per Arrow
        batch."""
        from pyspark.sql import SparkSession
        from pyspark.sql.pandas.functions import pandas_udf

        spark = SparkSession.getActiveSession()
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.words)
        bc = self._bc

        @pandas_udf("boolean")
        def _member(pos):
            import pandas as pd
            if not len(pos):
                return pd.Series([], dtype=bool)
            P = np.stack(pos.to_numpy()).astype(np.int64)
            W = bc.value
            w = W[P >> 6]
            bits = (w >> (P & 63).astype(np.uint64)) & np.uint64(1)
            return pd.Series(bits.all(axis=1))

        positions = F.array(*bloom_position_exprs(
            key_col, n_bits=self.n_bits, n_hashes=self.n_hashes,
            seed=self.seed, hash_method=self.hash_method))
        return _member(positions)

    def filter_known(self, df: DataFrame, key_col: str) -> DataFrame:
        """Rows whose key MIGHT be in the fitted set (true members plus
        ~fpp_estimate false positives)."""
        return df.filter(self.might_contain(key_col))

    def filter_new(self, df: DataFrame, key_col: str) -> DataFrame:
        """Rows whose key is DEFINITELY not in the fitted set — the
        incremental-ingest screen. Never passes a known key; drops
        ~fpp_estimate of the genuinely-new ones."""
        return df.filter(~self.might_contain(key_col))

    # -- persistence ------------------------------------------------------

    def save(self, spark, path: str) -> None:
        """Non-zero bitmap words as parquet + a JSON sidecar with the
        hash configuration (the searcher's parquet+meta convention)."""
        idx = np.nonzero(self.words)[0]
        # uint64 word -> signed long for the parquet column (bit pattern
        # preserved; load() masks back)
        rows = [(int(i), int(self.words[i].astype(np.int64)))
                for i in idx]
        spark.createDataFrame(rows or [(int(-1), int(0))],
                              "word_idx long, word long") \
            .write.mode("overwrite").parquet(os.path.join(path, "words"))
        meta = {"n_bits": self.n_bits, "n_hashes": self.n_hashes,
                "seed": self.seed, "hash_method": self.hash_method,
                "n_items": self.n_items}
        with open(os.path.join(path, "bloom_meta.json"), "w") as fh:
            json.dump(meta, fh)

    @classmethod
    def load(cls, spark, path: str) -> "BloomFilter":
        with open(os.path.join(path, "bloom_meta.json")) as fh:
            meta = json.load(fh)
        words = np.zeros((meta["n_bits"] + 63) // 64, dtype=np.uint64)
        for r in spark.read.parquet(os.path.join(path, "words")).collect():
            if r["word_idx"] >= 0:
                words[r["word_idx"]] = np.uint64(r["word"] & ((1 << 64) - 1))
        return cls(words, **meta)


def fit_bloom(df: DataFrame, *, key_col: str,
              expected_items: int | None = None, fpp: float = 0.01,
              n_bits: int | None = None, n_hashes: int | None = None,
              seed: int = 42, hash_method: str = "xxhash64") -> BloomFilter:
    """Fit a Bloom filter over ``df[key_col]``.

    Sizing: ``n_bits = ceil(-n·ln(fpp)/ln²2)`` and ``n_hashes =
    round(ln2·n_bits/n)`` from ``expected_items`` (counted from ``df``
    when omitted — one extra pass) unless given explicitly. The bitmap
    lives on the driver and broadcasts: capped at 2^33 bits (1 GiB) —
    at the cap, ~0.9 billion keys fit at 1% fpp; beyond that, shard the
    keyspace into multiple filters.

    Scale shape: k map-side position expressions → explode → word-keyed
    ``bit_or`` aggregate (partial combine dedups bits before the
    shuffle; shuffle ∝ distinct set words ≤ m/64) → driver collect of
    the non-zero words only.
    """
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n = expected_items
    if n_bits is None or n_hashes is None:
        if n is None:
            n = df.select(key_col).count()
        n = max(int(n), 1)
    if n_bits is None:
        n_bits = max(64, int(math.ceil(-n * math.log(fpp)
                                       / (math.log(2) ** 2))))
    if n_bits > MAX_BITS:
        raise ValueError(
            f"n_bits={n_bits} exceeds the {MAX_BITS} (1 GiB) driver-bitmap "
            f"cap; shard the keyspace into multiple filters")
    if n_hashes is None:
        n_hashes = max(1, int(round(math.log(2) * n_bits / n)))

    pos = df.select(F.explode(F.array(*bloom_position_exprs(
        key_col, n_bits=n_bits, n_hashes=n_hashes, seed=seed,
        hash_method=hash_method))).alias("pos"))
    # pyspark's shiftleft() only takes a literal shift amount; the SQL
    # form accepts a column
    word_rows = (pos.select(F.shiftright("pos", 6).alias("w"),
                            F.expr("shiftleft(CAST(1 AS BIGINT), "
                                   "CAST(pos % 64 AS INT))").alias("bit"))
                 .groupBy("w").agg(F.bit_or("bit").alias("word"))
                 .collect())
    words = np.zeros((n_bits + 63) // 64, dtype=np.uint64)
    for r in word_rows:
        words[r["w"]] = np.uint64(r["word"] & ((1 << 64) - 1))
    n_items = n if n is not None else df.count()
    return BloomFilter(words, n_bits=n_bits, n_hashes=n_hashes, seed=seed,
                       hash_method=hash_method, n_items=int(n_items))
