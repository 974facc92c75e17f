"""WordPiece tokenizer training and encoding over a corpus (Wu et al.
2016, arXiv:1609.08144 — the BERT tokenizer family; Schuster & Nakajima
2012 for the original likelihood criterion).

The third production subword family next to BPE (``operators/bpe.py``,
frequency-scored merges) and Unigram-LM (``operators/unigram.py``,
EM + Viterbi): WordPiece trains BPE-style merges but scores candidate
pairs by the LIKELIHOOD gain ``count(ab) / (count(a) · count(b))`` —
merging two symbols that rarely occur apart beats merging two globally
frequent ones — and encodes with greedy LONGEST-MATCH-FIRST against the
final vocabulary (not by replaying merges), with non-word-initial
pieces carrying the ``##`` continuation prefix and unmatched words
collapsing to ``[UNK]``. Same distribution discipline as the siblings:

- **word counting distributes** (``bpe.word_frequencies`` — one explode
  + one groupBy, bounded by ``max_word_types``);
- **merge training runs driver-side on the type table** — pair and
  unigram counts update incrementally per merge (the BPE inverted-index
  machinery), but the argmax is a full scan over live pair counts each
  round: the likelihood score's denominator changes for EVERY pair
  containing a merged symbol, so a lazy heap would serve stale
  priorities. Budget ~seconds per 1k merges per 100k types;
- **encoding is one vectorized pandas_udf pass** with a per-batch word
  cache (Zipf-repeated words encode once per batch).

Determinism: merge ties break on (score desc, pair asc); encode is a
deterministic greedy scan — the properties that let a frozen vocabulary
be oracle-replayed in DuckDB as a recursive longest-prefix CTE
(registry ``text_token_stats`` 'wordpiece' columns).

UNK semantics (the BERT contract, a deliberate difference from the
lossless siblings): a word with ANY unmatchable position — an
out-of-vocabulary character, or a tail no vocab piece covers — encodes
as the single ``[UNK]`` token, and words longer than ``max_word_len``
(HF's ``max_input_chars_per_word``) short-circuit to ``[UNK]`` without
scanning.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.operators.bpe import word_frequencies

#: continuation prefix (BERT convention) and the unknown-word token
CONT = "##"
UNK = "[UNK]"


def _word_symbols(word: str) -> list[str]:
    """BERT's initial segmentation: first char bare, rest ##-prefixed."""
    return [word[0]] + [CONT + c for c in word[1:]]


def _fuse(a: str, b: str) -> str:
    """Merge two adjacent in-word symbols; ``b`` is never word-initial,
    so its continuation prefix folds into ``a``'s."""
    return a + (b[len(CONT):] if b.startswith(CONT) else b)


def _train_wordpiece(word_freqs: Iterable[tuple[str, int]],
                     n_merges: int) -> list[str]:
    """Likelihood-scored merge loop on a (word, freq) type table.

    Returns the ORDERED vocabulary: every initial symbol (bare and
    ##-prefixed chars, sorted) followed by the fused pieces in merge
    order — the order is part of the trained artifact (ties in later
    pruning/inspection stay deterministic) even though longest-match
    encoding only consults membership.

    Each round merges the pair maximizing
    ``count(pair) / (count(left) · count(right))`` over CURRENT symbol
    counts (ties: lexicographic pair), requiring pair count ≥ 2 —
    singleton merges are memorization, the same floor bpe.py applies."""
    from collections import defaultdict

    words: list[tuple[list[str], int]] = [
        (_word_symbols(w), f) for w, f in word_freqs if w]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    sym_counts: dict[str, int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (syms, freq) in enumerate(words):
        for s in syms:
            sym_counts[s] += freq
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freq
            where[p].add(i)

    vocab: list[str] = sorted(sym_counts)
    seen = set(vocab)
    for _ in range(n_merges):
        best, best_score = None, None
        for p, c in pair_counts.items():
            if c < 2:
                continue
            score = c / (sym_counts[p[0]] * sym_counts[p[1]])
            if best_score is None or score > best_score or \
                    (score == best_score and p < best):
                best, best_score = p, score
        if best is None:
            break
        a, b = best
        ab = _fuse(a, b)
        for i in list(where.get(best, ())):
            syms, freq = words[i]
            for s in syms:
                sym_counts[s] -= freq
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= freq
                if pair_counts[p] <= 0:
                    pair_counts.pop(p, None)
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
            for s in out:
                sym_counts[s] += freq
            for p in zip(out, out[1:]):
                pair_counts[p] += freq
                where[p].add(i)
        for s in (a, b):
            if sym_counts.get(s, 0) <= 0:
                sym_counts.pop(s, None)
        if ab not in seen:
            vocab.append(ab)
            seen.add(ab)
    return vocab


def encode_word(word: str, vocab: "set[str]",
                max_piece_len: int, max_word_len: int = 100) -> list[str]:
    """Greedy longest-match-first WordPiece encoding of one word."""
    n = len(word)
    if n > max_word_len:
        return [UNK]
    out: list[str] = []
    pos = 0
    while pos < n:
        for k in range(min(max_piece_len, n - pos), 0, -1):
            piece = word[pos:pos + k] if pos == 0 \
                else CONT + word[pos:pos + k]
            if piece in vocab:
                out.append(piece)
                pos += k
                break
        else:
            return [UNK]
    return out


class WordPieceTokenizer:
    """An ordered vocabulary + the encode/count column functions."""

    def __init__(self, vocab: "Iterable[str]", *,
                 max_word_len: int = 100):
        self.vocab = list(vocab)
        self._set = set(self.vocab)
        if len(self._set) != len(self.vocab):
            raise ValueError("duplicate pieces in WordPiece vocabulary")
        self.max_word_len = max_word_len
        #: longest RAW piece span (continuation prefix excluded) — the
        #: greedy scan's window
        self.max_piece_len = max(
            (len(p) - len(CONT) if p.startswith(CONT) else len(p)
             for p in self.vocab), default=1)

    # -- training ----------------------------------------------------------

    @classmethod
    def train(cls, df: DataFrame, *, text_col: str = "text",
              n_merges: int = 1000,
              max_word_types: int | None = 1_000_000,
              max_word_len: int = 100) -> "WordPieceTokenizer":
        wf = word_frequencies(df, text_col=text_col,
                              max_word_types=max_word_types)
        pairs = [(r["word"], r["freq"]) for r in wf.collect()]
        return cls(_train_wordpiece(pairs, n_merges),
                   max_word_len=max_word_len)

    # -- encoding ----------------------------------------------------------

    def encode_expr(self, text_col: str | Column) -> Column:
        """array<string> of WordPiece tokens for a text column — one
        vectorized pandas_udf pass; the vocab set rides the task
        closure; a per-batch word cache collapses Zipf-repeated words.
        Splits on the ASCII whitespace class exactly like
        functions/text.tokens (the bpe.py trap)."""
        import re

        vocab, mpl, mwl = self._set, self.max_piece_len, self.max_word_len
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
                        got = cache[w] = encode_word(w, vocab, mpl, mwl)
                    out.extend(got)
                return out

            return batch.map(enc_text)

        return _enc(F.col(text_col) if isinstance(text_col, str)
                    else text_col)

    def token_count_expr(self, text_col: str | Column) -> Column:
        return F.size(self.encode_expr(text_col))

    def token_counts(self, df: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
        return df.select(F.col(id_col),
                         self.token_count_expr(text_col)
                         .alias("n_wordpiece_tokens"))

    # -- persistence -------------------------------------------------------

    def save(self, spark, path: str) -> None:
        rows = [(i, p, self.max_word_len)
                for i, p in enumerate(self.vocab)]
        spark.createDataFrame(rows, "ord int, piece string, mwl int") \
            .coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "WordPieceTokenizer":
        rows = spark.read.parquet(path).orderBy("ord").collect()
        if rows and [r["ord"] for r in rows] != list(range(len(rows))):
            raise ValueError("vocabulary order is not contiguous — "
                             "corrupt tokenizer?")
        mwls = {r["mwl"] for r in rows}
        if len(mwls) > 1:
            raise ValueError("inconsistent max_word_len in saved "
                             "vocabulary — corrupt tokenizer?")
        return cls([r["piece"] for r in rows],
                   max_word_len=mwls.pop() if mwls else 100)
