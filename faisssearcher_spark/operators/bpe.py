"""Byte-pair-encoding tokenizer training and encoding over a corpus.

A training-data pipeline needs REAL subword token counts — packing
(`sampling.pack_token_budget`), context-length chunking, and mixture
budgeting are all denominated in tokenizer tokens, and the chars/4
heuristic (`functions/text.bpe_token_estimate`) drifts 2×+ across
languages. This module trains a standard BPE vocabulary (Sennrich et al.
2016, arXiv:1508.07909) the way production trainers do on large corpora:

- **word counting distributes** — one explode + one groupBy over the
  corpus; the output is the word-TYPE table, which Zipf keeps tiny
  relative to the corpus (bounded further by ``max_word_types``: training
  on the most frequent types is exactly what sentencepiece's
  ``input_sentence_size`` sampling approximates);
- **merges train driver-side on the type table** — the classic
  pair-count/merge loop touches only (word_type, freq) pairs, never the
  corpus; ``vocab_size`` iterations over a ~10⁵-type table is seconds;
- **encoding is one vectorized pandas_udf pass** — the ordered merge
  list broadcasts with the task closure; each batch encodes through a
  per-batch word cache (Zipf again: a batch of documents repeats a small
  set of words).

Determinism: ties in pair frequency break lexicographically, so the same
corpus always yields the same merges — the property that lets a saved
tokenizer be rebuilt and checked.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T

#: end-of-word marker (the Sennrich convention: distinguishes "est" in
#: "estimate" from "est</w>" in "smallest")
END = "</w>"


def word_frequencies(df: DataFrame, *, text_col: str = "text",
                     max_word_types: int | None = None) -> DataFrame:
    """Distributed word-type counts: ``(word, freq)``, optionally limited
    to the ``max_word_types`` most frequent types (deterministic
    freq-desc, word-asc order)."""
    wf = (df.select(F.explode_outer(T.tokens(text_col)).alias("word"))
          .filter(F.col("word").isNotNull())
          .groupBy("word").agg(F.count("*").alias("freq")))
    if max_word_types is not None:
        wf = (wf.orderBy(F.col("freq").desc(), F.col("word").asc())
              .limit(max_word_types))
    return wf


def _train_merges(word_freqs: Iterable[tuple[str, int]],
                  n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE on a (word, freq) type table: repeatedly merge the
    most frequent adjacent symbol pair (ties break lexicographically).

    Pure driver code over the Zipf-small table, INCREMENTAL: a merge
    re-counts only the words that contain the merged pair (inverted
    pair→word index) and the max is a lazy-invalidation heap, so cost
    per merge ∝ affected symbols, not corpus vocabulary — the difference
    between a 30k-merge production vocab finishing in seconds versus
    re-scanning every word type 30k times (O(total symbols · merges))."""
    import heapq
    from collections import defaultdict

    words: list[tuple[list[str], int]] = [
        (list(w) + [END], f) for w, f in word_freqs if w]
    counts: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (syms, freq) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] += freq
            where[p].add(i)
    # heap of (-count, pair); stale entries are skipped on pop
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    def push(p):
        heapq.heappush(heap, (-counts[p], p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        neg, best = heapq.heappop(heap)
        cur = counts.get(best, 0)
        if -neg != cur:        # stale entry: current count differs
            if cur > 0:
                push(best)
            continue
        if cur < 2:
            break   # nothing repeats; further merges are memorization
        merges.append(best)
        a, b = best
        ab = a + b
        touched: set[tuple[str, str]] = set()
        for i in list(where.get(best, ())):
            syms, freq = words[i]
            for p in zip(syms, syms[1:]):       # retract this word
                counts[p] -= freq
                touched.add(p)
                if counts[p] <= 0:
                    counts.pop(p, None)
                where[p].discard(i)
            j, out = 0, []
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = (out, freq)
            for p in zip(out, out[1:]):          # re-add, merged
                counts[p] = counts.get(p, 0) + freq
                touched.add(p)
                where[p].add(i)
        for p in touched:
            if counts.get(p, 0) > 0:
                push(p)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge loop (the standard BPE encoder)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BPETokenizer:
    """An ordered merge list + the encode/count column functions."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)

    # -- training ----------------------------------------------------------

    @classmethod
    def train(cls, df: DataFrame, *, text_col: str = "text",
              n_merges: int = 1000,
              max_word_types: int | None = 1_000_000) -> "BPETokenizer":
        wf = word_frequencies(df, text_col=text_col,
                              max_word_types=max_word_types)
        pairs = [(r["word"], r["freq"]) for r in wf.collect()]
        return cls(_train_merges(pairs, n_merges))

    # -- encoding ----------------------------------------------------------

    def encode_expr(self, text_col: str | Column) -> Column:
        """array<string> of subword tokens for a text column — one
        vectorized pandas_udf pass; merge ranks ride the task closure;
        a per-batch word cache collapses Zipf-repeated words."""
        import re

        ranks = {p: i for i, p in enumerate(self.merges)}
        # MUST split exactly like functions/text.tokens (Java \s+ = ASCII
        # whitespace only): Python str.split() also breaks on Unicode
        # whitespace (NBSP,  , …), which would segment words the
        # trainer saw as single types — merges would never apply and
        # counts would drift from the trained distribution.
        ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")

        @F.pandas_udf("array<string>")
        def _enc(batch: pd.Series) -> pd.Series:
            cache: dict[str, list[str]] = {}

            def enc_text(text) -> list[str]:
                if text is None:
                    return []
                out: list[str] = []
                for w in ascii_ws.split(text.strip(" \t\n\x0b\f\r")):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    out.extend(got)
                return out

            return batch.map(enc_text)

        return _enc(F.col(text_col) if isinstance(text_col, str)
                    else text_col)

    def token_count_expr(self, text_col: str | Column) -> Column:
        """Exact subword token count — the packing/budgeting currency."""
        return F.size(self.encode_expr(text_col))

    def token_counts(self, df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
        return df.select(F.col(id_col),
                         self.token_count_expr(text_col)
                         .alias("n_bpe_tokens"))

    # -- persistence -------------------------------------------------------

    def save(self, spark, path: str) -> None:
        rows = [(i, a, b) for i, (a, b) in enumerate(self.merges)]
        spark.createDataFrame(rows, "rank int, left string, right string") \
            .coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "BPETokenizer":
        rows = spark.read.parquet(path).orderBy("rank").collect()
        if rows and [r["rank"] for r in rows] != list(range(len(rows))):
            raise ValueError("merge table ranks are not contiguous — "
                             "corrupt tokenizer?")
        return cls([(r["left"], r["right"]) for r in rows])
