"""Unigram language-model tokenizer (Kudo 2018, arXiv:1804.10959 — the
SentencePiece ``--model_type=unigram`` algorithm) over a corpus.

The second production subword family next to BPE (`operators/bpe.py`):
instead of greedy merges, a piece VOCABULARY with log-probabilities is
EM-trained and encoding picks each word's maximum-likelihood
segmentation (Viterbi). Same distribution discipline as BPE:

- **word counting distributes** — one explode + one groupBy; training
  touches only the Zipf-small (word_type, freq) table, bounded by
  ``max_word_types``;
- **seeding + EM run driver-side on the type table** — seed pieces are
  the most frequent substrings (≤ ``max_piece_len``) plus every
  character; each EM round is one forward-backward pass per word type
  (log-space, O(len · max_piece_len) per word), with SentencePiece's
  prune-worst-fraction schedule down to ``vocab_size``. The E-step is
  numpy-vectorized across word types over a padded substring lattice
  (r8; ~1 s per round per 100k types vs 4-5 s for the scalar loop,
  which survives as the parity-test reference) — size
  ``max_word_types`` to the fit budget (~100k covers natural-language
  Zipf heads; sentencepiece itself trains on a bounded sample — its
  ``input_sentence_size`` — for the same reason);
- **encoding is one vectorized pandas_udf pass** — the piece→logp dict
  broadcasts with the task closure; per-batch word cache collapses
  Zipf-repeated words.

Determinism (what lets a trained model be oracle-replayed): the M-step
and pruning sort pieces explicitly, logsumexp/Viterbi loop in fixed
(position, piece-length) order, and Viterbi ties prefer the LONGER
final piece — the same argmax rule a DuckDB recursive CTE replays
bit-for-bit on the frozen piece table (registry ``text_token_stats``
'unigram' columns).

Out-of-vocabulary characters encode as themselves at ``UNK_LOGP`` —
segmentation never fails and piece concatenation always rebuilds the
word (losslessness is a test invariant).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faisssearcher_spark.operators.bpe import word_frequencies

#: log-probability floor for out-of-vocabulary single characters: low
#: enough that any real-piece path beats a path through an UNK char
#: (trained log-probs are ≥ −50ish), high enough that sums over a word
#: never approach float range. The ORACLE must use the same constant.
UNK_LOGP = -1000.0


def _seed_pieces(word_freqs: "list[tuple[str, int]]", *,
                 max_piece_len: int, n_seed: int) -> dict[str, float]:
    """Most frequent substrings (occurrence-weighted) + every character.

    Characters are unconditionally kept so every word stays segmentable;
    multi-char seeds fill the remaining ``n_seed`` slots by (count desc,
    piece asc) — the deterministic tie order used everywhere here."""
    cnt: dict[str, int] = defaultdict(int)
    chars: set[str] = set()
    for w, f in word_freqs:
        n = len(w)
        for i in range(n):
            chars.add(w[i])
            for k in range(1, min(max_piece_len, n - i) + 1):
                cnt[w[i:i + k]] += f
    return _seed_select(cnt, chars, n_seed)


def _seed_select(cnt: "dict[str, float]", chars: "set[str]",
                 n_seed: int) -> dict[str, float]:
    """The :func:`_seed_pieces` selection + normalization, factored so
    the scalar dict and the lattice bincount feed the same arithmetic:
    characters unconditionally, multi-char seeds by (count desc, piece
    asc), log-probs normalized over the selected set. Counts are exact
    integers in float64, so both producers yield bitwise-equal seeds."""
    pieces = {c: float(cnt[c]) for c in chars}
    multi = sorted(((p, c) for p, c in cnt.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    for p, c in multi[:max(0, n_seed - len(pieces))]:
        pieces[p] = float(c)
    total = math.log(sum(pieces[p] for p in sorted(pieces)))
    return {p: math.log(c) - total for p, c in pieces.items()}


def _seed_pieces_from_lattice(lat: "_EmLattice",
                              n_seed: int) -> dict[str, float]:
    """:func:`_seed_pieces` read off an already-built ``_EmLattice`` —
    the vectorized path's seeding (the substring enumeration is the
    lattice build; re-running it as a Python loop doubled short fits).

    The top-``n_seed`` selection runs array-side (one lexsort by
    (count desc, piece asc) over the multi-char pieces) so only the
    ~``n_seed`` SELECTED pieces ever touch Python — sorting the full
    substring table as Python tuples was half the seeding cost. Counts
    are integers exact in float64: the lexsort tie order, the
    normalization sum, and every logp match :func:`_seed_pieces`
    bitwise (pinned in tests)."""
    import numpy as np

    cnt = lat.seed_counts_arr()
    subs = np.array(lat.sub_list, dtype=f"U{lat.K}")
    single = lat.single_char
    n_chars = int(single.sum())
    take = max(0, n_seed - n_chars)
    midx = np.flatnonzero(~single)
    order = midx[np.lexsort((subs[midx], -cnt[midx]))][:take]
    pieces = {p: c for p, c in zip(subs[single].tolist(),
                                   cnt[single].tolist())}
    pieces.update(zip(subs[order].tolist(), cnt[order].tolist()))
    total = math.log(sum(pieces[p] for p in sorted(pieces)))
    return {p: math.log(c) - total for p, c in pieces.items()}


def _logsumexp2(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


class _EmLattice:
    """Padded-matrix view of the word-type table for the vectorized
    E-step: every substring w[i:i+k] (k ≤ max_piece_len) of every word
    gets a STABLE integer id, and ``S[w, i, k-1]`` holds that id (-1
    past the word's end — numpy's -1 index then reads the lookup
    table's dedicated -inf slot, so padding needs no masking). Built
    once per ``train()``; rounds only refresh the id → logp lookup."""

    def __init__(self, word_freqs: "list[tuple[str, int]]",
                 max_piece_len: int):
        import numpy as np

        self.words = [w for w, _ in word_freqs]
        self.freqs = np.array([f for _, f in word_freqs],
                              dtype=np.float64)
        self.lens = np.array([len(w) for w in self.words],
                             dtype=np.int64)
        self.L = int(self.lens.max(initial=0))
        self.K = max_piece_len
        # numpy char-ops build (r9): words as a padded UCS4 code-point
        # matrix, every k-length substring enumerated with one
        # sliding-window view + np.unique per k — ~10× the Python
        # triple loop, which dominated short fits once the EM rounds
        # were vectorized. Substring-id NUMBERING differs from the
        # insertion-order loop but that is immaterial: counts key back
        # through the substring STRINGS and every consumer sorts
        # (np.bincount also accumulates per bucket in word order, so
        # even float sums are bit-identical under an id permutation —
        # the FIXED_UNIGRAM_PIECES freeze depends on this). The loop
        # build survives as the fallback for the one case the U-dtype
        # round-trip cannot represent (embedded NUL code points, which
        # numpy's 'U' views treat as padding).
        if self.words and self.L and not any("\x00" in w
                                             for w in self.words):
            self._build_np(np)
        else:
            self._build_py(np)
        self.single_char = np.array(
            [len(p) == 1 for p in self.sub_list], dtype=bool)

    def _build_np(self, np) -> None:
        W, L, K = len(self.words), self.L, self.K
        C = np.array(self.words, dtype=f"U{L}") \
            .view(np.uint32).reshape(W, L)
        S = np.full((W, L, K), -1, dtype=np.int32)
        sub_list: list[str] = []
        offset = 0
        for k in range(1, min(K, L) + 1):
            n_i = L - k + 1
            win = np.lib.stride_tricks.sliding_window_view(
                C, k, axis=1)                       # (W, n_i, k)
            valid = (np.arange(n_i)[None, :] + k) <= self.lens[:, None]
            rows = np.ascontiguousarray(win[valid]) # (n_valid, k)
            if not len(rows):
                continue
            # unique over fixed-width byte rows (void view: one compare
            # per row instead of k column compares)
            _, first, inv = np.unique(rows.view(f"V{4 * k}").ravel(),
                                      return_index=True,
                                      return_inverse=True)
            S[:, :n_i, k - 1][valid] = inv.astype(np.int32) + offset
            sub_list.extend(rows[first].view(f"U{k}").ravel().tolist())
            offset += len(first)
        self.S = S
        self.sub_list = sub_list
        self.sub_ids = {p: i for i, p in enumerate(sub_list)}

    def _build_py(self, np) -> None:
        sub_ids: dict[str, int] = {}
        S = np.full((len(self.words), self.L, self.K), -1,
                    dtype=np.int32)
        for wi, w in enumerate(self.words):
            n = len(w)
            for i in range(n):
                for k in range(1, min(self.K, n - i) + 1):
                    p = w[i:i + k]
                    pid = sub_ids.get(p)
                    if pid is None:
                        pid = sub_ids[p] = len(sub_ids)
                    S[wi, i, k - 1] = pid
        self.S = S
        self.sub_ids = sub_ids
        self.sub_list = sorted(sub_ids, key=sub_ids.get)

    def seed_counts_arr(self):
        """Occurrence-weighted substring counts by id (the
        :func:`_seed_pieces` enumeration, read off the already-built
        lattice): one masked bincount over S with each word's frequency
        broadcast across its cells. Counts are integers held exactly in
        float64, so the sum order is immaterial and each value matches
        the scalar dict's."""
        import numpy as np

        mask = self.S >= 0
        ids = self.S[mask]
        wts = np.broadcast_to(
            self.freqs[:, None, None], self.S.shape)[mask]
        return np.bincount(ids, weights=wts,
                           minlength=len(self.sub_list))

    def lookup(self, logp: dict[str, float]):
        """id → logp array (+1 slot of -inf for the -1 padding): vocab
        pieces carry their trained log-prob, out-of-vocab SINGLE chars
        the UNK floor, everything else -inf (an impossible piece —
        exactly the terms the scalar loop skips)."""
        import numpy as np

        lk = np.full(len(self.sub_list) + 1, -np.inf)
        lk[:-1][self.single_char] = UNK_LOGP
        for p, v in logp.items():
            pid = self.sub_ids.get(p)
            if pid is not None:
                lk[pid] = v
        return lk


def _logsumexp2_vec(a, b):
    """Element-wise :func:`_logsumexp2` over arrays, -inf-safe: where
    either side is -inf the result is the other side (no NaN from
    -inf - -inf)."""
    import numpy as np

    hi = np.maximum(a, b)
    lo = np.minimum(a, b)
    with np.errstate(invalid="ignore"):
        out = hi + np.log1p(np.exp(lo - hi))
    return np.where(np.isinf(lo) & (lo < 0), hi, out)


def _em_round_vec(lat: "_EmLattice",
                  logp: dict[str, float]) -> dict[str, float]:
    """Vectorized E-step: the same forward-backward recursion as
    :func:`_em_round`, run across ALL word types at once over the
    padded lattice (one numpy op per (position, piece-length) step
    instead of a Python loop per word — measured ~4-5× per round at
    100k types, and unlike the scalar dict-lookup loop the cost is
    insensitive to vocabulary size, which is what makes 1M-type
    large-vocab fits practical).

    Per-element float semantics mirror the scalar chain (same k-order
    logsumexp folds); absolute bit-parity is NOT guaranteed because
    numpy's SIMD exp/log1p differ from libm by ≤1 ulp — the parity
    test pins identical piece SETS and logps to 1e-9, and the frozen
    gate table is regenerated from this (the canonical) path."""
    import numpy as np

    W, L, K = len(lat.words), lat.L, lat.K
    if W == 0:
        return {}
    lk = lat.lookup(logp)
    LP = lk[lat.S]                       # (W, L, K) per-piece log-probs
    la = np.full((W, L + 1), -np.inf)
    la[:, 0] = 0.0
    for j in range(1, L + 1):
        acc = np.full(W, -np.inf)
        for k in range(1, min(K, j) + 1):
            acc = _logsumexp2_vec(acc, la[:, j - k] + LP[:, j - k, k - 1])
        la[:, j] = acc
    lb = np.full((W, L + K + 1), -np.inf)   # K of -inf padding past the
    lb[np.arange(W), lat.lens] = 0.0        # end so lb[:, i+k] never
    for i in range(L - 1, -1, -1):          # needs a bounds branch
        live = i < lat.lens
        acc = np.full(W, -np.inf)
        for k in range(1, min(K, L - i) + 1):
            acc = _logsumexp2_vec(acc, LP[:, i, k - 1] + lb[:, i + k])
        # keep the boundary cell (lb[w, len(w)] = 0) of words whose
        # length equals this position — overwriting it with -inf would
        # zero the whole lattice for every word shorter than the pad
        lb[:, i] = np.where(live, acc, lb[:, i])
    z = la[np.arange(W), lat.lens]
    ok = ~np.isinf(z)
    in_vocab = np.zeros(len(lat.sub_list) + 1, dtype=bool)
    for p in logp:
        pid = lat.sub_ids.get(p)
        if pid is not None:
            in_vocab[pid] = True
    # posterior per (position, piece-length) step — a W-sized slice at
    # a time: materializing the whole W×L×K posterior at once measured
    # 3.5× SLOWER than this loop (five lattice-sized temporaries of
    # memory traffic and a full-lattice exp vs compacted masked exps)
    n = len(lat.sub_list)
    counts = np.zeros(n)
    with np.errstate(invalid="ignore"):
        for i in range(L):
            for k in range(1, min(K, L - i) + 1):
                pid = lat.S[:, i, k - 1]
                post = la[:, i] + LP[:, i, k - 1] + lb[:, i + k] - z
                m = ok & in_vocab[pid] & (post > -60.0)
                if not m.any():
                    continue
                counts += np.bincount(
                    pid[m], weights=lat.freqs[m] * np.exp(post[m]),
                    minlength=n)
    return {lat.sub_list[i]: float(c)
            for i, c in enumerate(counts) if c != 0.0}


def _em_round(word_freqs, logp: dict[str, float],
              max_piece_len: int) -> dict[str, float]:
    """One soft-EM E-step: expected piece counts over every word type's
    segmentation lattice (log-space forward-backward). The scalar
    reference implementation — :func:`_em_round_vec` is the production
    path; this one stays as the parity/property-test oracle."""
    exp: dict[str, float] = defaultdict(float)
    for w, f in word_freqs:
        n = len(w)
        la = [0.0] + [-math.inf] * n
        for j in range(1, n + 1):
            acc = -math.inf
            for k in range(1, min(max_piece_len, j) + 1):
                lp = logp.get(w[j - k:j])
                if lp is None:
                    lp = UNK_LOGP if k == 1 else None
                if lp is not None and la[j - k] != -math.inf:
                    acc = _logsumexp2(acc, la[j - k] + lp)
            la[j] = acc
        lb = [-math.inf] * n + [0.0]
        for i in range(n - 1, -1, -1):
            acc = -math.inf
            for k in range(1, min(max_piece_len, n - i) + 1):
                lp = logp.get(w[i:i + k])
                if lp is None:
                    lp = UNK_LOGP if k == 1 else None
                if lp is not None and lb[i + k] != -math.inf:
                    acc = _logsumexp2(acc, lp + lb[i + k])
            lb[i] = acc
        z = la[n]
        if z == -math.inf:
            continue
        for i in range(n):
            for k in range(1, min(max_piece_len, n - i) + 1):
                p = w[i:i + k]
                lp = logp.get(p)
                if lp is None:
                    continue
                post = la[i] + lp + lb[i + k] - z
                if post > -60.0:          # exp underflow guard
                    exp[p] += f * math.exp(post)
    return exp


def _m_step(exp: dict[str, float],
            keep: Iterable[str]) -> dict[str, float]:
    """Re-normalize expected counts into log-probs (sorted-order sum for
    run-to-run determinism); pieces with no mass get a floor just above
    UNK so they can be pruned next round but never beat a real path."""
    floor = 1e-12
    total = sum(max(exp.get(p, 0.0), floor) for p in sorted(keep))
    lt = math.log(total)
    return {p: math.log(max(exp.get(p, 0.0), floor)) - lt for p in keep}


def viterbi_segment(word: str, logp: dict[str, float],
                    max_piece_len: int) -> list[str]:
    """Maximum-likelihood segmentation; ties prefer the longer final
    piece (the rule the SQL oracle replays). OOV chars cost UNK_LOGP."""
    n = len(word)
    dp = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        best, best_k = -math.inf, 0
        for k in range(1, min(max_piece_len, j) + 1):
            lp = logp.get(word[j - k:j])
            if lp is None:
                lp = UNK_LOGP if k == 1 else None
            if lp is None or dp[j - k] == -math.inf:
                continue
            s = dp[j - k] + lp
            if s > best or (s == best and k > best_k):
                best, best_k = s, k
        dp[j], back[j] = best, best_k
    out: list[str] = []
    j = n
    while j > 0:
        k = back[j]
        out.append(word[j - k:j])
        j -= k
    out.reverse()
    return out


class UnigramTokenizer:
    """A (piece → log-prob) table + the encode/count column functions."""

    def __init__(self, pieces: dict[str, float], *,
                 max_piece_len: int | None = None):
        self.pieces = dict(pieces)
        self.max_piece_len = max_piece_len or max(
            (len(p) for p in self.pieces), default=1)

    # -- training ------------------------------------------------------

    @classmethod
    def train(cls, df: DataFrame, *, text_col: str = "text",
              vocab_size: int = 2000, max_piece_len: int = 8,
              seed_factor: int = 4, em_iters: int = 2,
              prune_fraction: float = 0.2,
              max_word_types: int | None = 1_000_000,
              max_word_len: int = 48,
              em_impl: str = "vectorized") -> "UnigramTokenizer":
        """SentencePiece schedule: seed ``vocab_size·seed_factor``
        pieces, then alternate ``em_iters`` EM rounds with pruning the
        worst ``prune_fraction`` of multi-char pieces (by expected
        count) until ``vocab_size`` remains, then final EM rounds.
        Characters are never pruned.

        ``max_word_len`` drops LONGER word types from the EM fit (both
        impls, so parity holds): the padded lattice is W×L×K with L =
        the single longest surviving word, so one 2000-char base64
        blob/URL in a crawl would inflate every word's lattice
        (SentencePiece's ``max_sentence_length`` plays the same role).
        Dropped types still ENCODE fine — Viterbi has no lattice cap.

        ``em_impl``: 'vectorized' (default — the numpy padded-lattice
        forward-backward, ~4-5× the scalar loop per round at 100k
        types and vocab-size-insensitive, what makes 1M-type fits
        practical) or 'scalar' (the reference loop; parity is pinned
        in tests: identical piece sets, logps to 1e-9 — see
        :func:`_em_round_vec` on why not bitwise)."""
        if em_impl not in ("vectorized", "scalar"):
            raise ValueError(
                f"em_impl must be 'vectorized' or 'scalar', got {em_impl}")
        if max_word_len < 1:
            raise ValueError(
                f"max_word_len must be >= 1, got {max_word_len}")
        wf = word_frequencies(df, text_col=text_col,
                              max_word_types=max_word_types)
        pairs = [(r["word"], r["freq"]) for r in wf.collect()
                 if len(r["word"]) <= max_word_len]
        if em_impl == "vectorized":
            lat = _EmLattice(pairs, max_piece_len)
            run_round = lambda lp: _em_round_vec(lat, lp)  # noqa: E731
            # seeding IS the same substring enumeration the lattice
            # just did — read the counts off it (bitwise-equal seeds,
            # pinned in tests) instead of re-looping in Python
            logp = _seed_pieces_from_lattice(
                lat, n_seed=vocab_size * seed_factor)
        else:
            run_round = lambda lp: _em_round(  # noqa: E731
                pairs, lp, max_piece_len)
            logp = _seed_pieces(pairs, max_piece_len=max_piece_len,
                                n_seed=vocab_size * seed_factor)
        while True:
            exp = {}
            for _ in range(em_iters):
                exp = run_round(logp)
                logp = _m_step(exp, logp.keys())
            if len(logp) <= vocab_size:
                break
            multi = sorted(
                ((p, exp.get(p, 0.0)) for p in logp if len(p) > 1),
                key=lambda pc: (pc[1], pc[0]))
            # SentencePiece's shrink schedule: drop a fixed fraction of
            # the prunable pieces per round (never past vocab_size), so
            # EM re-fits between prunes instead of one mass cull
            n_drop = min(len(logp) - vocab_size,
                         max(1, int(len(multi) * prune_fraction)),
                         len(multi))
            if n_drop <= 0:
                break
            dead = {p for p, _ in multi[:n_drop]}
            logp = {p: v for p, v in logp.items() if p not in dead}
        exp = run_round(logp)
        logp = _m_step(exp, logp.keys())
        return cls(logp, max_piece_len=max_piece_len)

    # -- encoding ------------------------------------------------------

    def encode_expr(self, text_col: str | Column) -> Column:
        """array<string> of pieces for a text column — one vectorized
        pandas_udf pass; the piece table rides the task closure; a
        per-batch word cache collapses Zipf-repeated words. Splits on
        the ASCII whitespace class exactly like functions/text.tokens
        (the bpe.py trap: Python str.split() also breaks on Unicode
        whitespace Java's \\s+ does not)."""
        import re

        logp, mpl = self.pieces, self.max_piece_len
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
                        got = cache[w] = viterbi_segment(w, logp, mpl)
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
                         .alias("n_unigram_tokens"))

    # -- persistence ---------------------------------------------------

    def save(self, spark, path: str) -> None:
        # max_piece_len rides every row: re-deriving it from the longest
        # SURVIVING piece would silently shrink the trained window when
        # pruning removed all pieces of the maximal length
        rows = [(p, lp, self.max_piece_len)
                for p, lp in sorted(self.pieces.items())]
        spark.createDataFrame(rows, "piece string, logp double, mpl int") \
            .coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "UnigramTokenizer":
        rows = spark.read.parquet(path).collect()
        pieces = {r["piece"]: r["logp"] for r in rows}
        if len(pieces) != len(rows):
            raise ValueError("duplicate pieces in saved table — "
                             "corrupt tokenizer?")
        mpls = {r["mpl"] for r in rows}
        if len(mpls) > 1:
            raise ValueError("inconsistent max_piece_len in saved "
                             "table — corrupt tokenizer?")
        return cls(pieces, max_piece_len=mpls.pop() if mpls else None)
