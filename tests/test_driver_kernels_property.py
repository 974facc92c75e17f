"""Property tests for the pure-driver kernels (hypothesis, no Spark).

These functions run inside training loops and executors, so a silent
invariant break would corrupt results without any gate noticing the
cause. Pinned here: BPE encode is lossless and merge-consistent for
ARBITRARY words and merge tables; PQ assignment is per-subspace optimal
and reconstruction stays inside the codebook hull; the OPQ rotation is
orthonormal for arbitrary data shapes.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from faisssearcher_spark.operators.ann import (_pq_assign, _pq_reconstruct,
                                               _train_opq_rotation)
from faisssearcher_spark.operators.bpe import END, _encode_word

WORD = st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126),
               min_size=1, max_size=24)


@st.composite
def word_and_ranks(draw):
    word = draw(WORD)
    syms = list(word) + [END]
    pool = list(zip(syms, syms[1:]))
    # arbitrary extra pairs, including merged multi-char symbols
    extra = draw(st.lists(st.tuples(WORD, WORD), max_size=6))
    pairs = draw(st.permutations(pool + extra))
    return word, {p: i for i, p in enumerate(pairs)}


@settings(max_examples=200, deadline=None)
@given(wr=word_and_ranks())
def test_bpe_encode_is_lossless_and_deterministic(wr):
    word, ranks = wr
    out = _encode_word(word, ranks)
    assert "".join(out) == word + END     # no character invented or lost
    assert _encode_word(word, ranks) == out
    # no adjacent pair in the OUTPUT may still be mergeable: the greedy
    # loop only stops when no known pair remains
    assert all(p not in ranks for p in zip(out, out[1:]))


@settings(max_examples=50, deadline=None)
@given(n=st.integers(2, 40), m=st.sampled_from([1, 2, 4]),
       ksub=st.integers(1, 8), dsub=st.integers(1, 4),
       seed=st.integers(0, 10**6))
def test_pq_assign_is_per_subspace_optimal(n, m, ksub, dsub, seed):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, m * dsub))
    books = rng.standard_normal((m, ksub, dsub))
    codes = _pq_assign(mat, books)
    assert codes.shape == (n, m)
    assert codes.min() >= 0 and codes.max() < ksub
    recon = _pq_reconstruct(codes, books)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        chosen = ((sub - recon[:, j * dsub:(j + 1) * dsub]) ** 2).sum(1)
        best = ((sub[:, None, :] - books[j][None, :, :]) ** 2) \
            .sum(2).min(1)
        assert np.allclose(chosen, best, atol=1e-10)


@settings(max_examples=10, deadline=None)
@given(n=st.integers(8, 60), m=st.sampled_from([2, 4]),
       dsub=st.integers(1, 4), seed=st.integers(0, 10**6))
def test_opq_rotation_is_orthonormal_for_any_shape(n, m, dsub, seed):
    rng = np.random.default_rng(seed)
    d = m * dsub
    mat = rng.standard_normal((n, d)) * np.linspace(2.0, 0.5, d)[None, :]
    rot, books = _train_opq_rotation(mat, m=m, ksub=4, iters=4,
                                     seed=seed % 1000, opq_iters=2)
    assert np.allclose(rot @ rot.T, np.eye(d), atol=1e-9)
    assert books.shape == (m, 4, dsub)
    assert np.isfinite(books).all()


@st.composite
def word_and_pieces(draw):
    word = draw(st.text(alphabet="abcd", min_size=1, max_size=10))
    # arbitrary piece table: random substrings of the word + noise
    subs = {word[i:j] for i in range(len(word))
            for j in range(i + 1, min(i + 4, len(word)) + 1)}
    chosen = draw(st.lists(st.sampled_from(sorted(subs)), max_size=8))
    noise = draw(st.lists(st.text(alphabet="abcd", min_size=1,
                                  max_size=3), max_size=4))
    logps = {}
    for p in chosen + noise:
        logps[p] = draw(st.floats(min_value=-20.0, max_value=-0.1,
                                  allow_nan=False))
    return word, logps


@settings(max_examples=200, deadline=None)
@given(wp=word_and_pieces())
def test_unigram_viterbi_lossless_optimal_deterministic(wp):
    """viterbi_segment over ARBITRARY piece tables: concatenation
    rebuilds the word, the chosen path's score is the max over every
    feasible segmentation (brute-forced), and the call is a pure
    function of its inputs."""
    import itertools

    from faisssearcher_spark.operators.unigram import (UNK_LOGP,
                                                       viterbi_segment)

    word, logps = wp
    K = 3
    out = viterbi_segment(word, logps, K)
    assert "".join(out) == word
    assert viterbi_segment(word, logps, K) == out

    def score(pieces):
        s = 0.0
        for p in pieces:
            lp = logps.get(p)
            if lp is None:
                if len(p) == 1:
                    lp = UNK_LOGP
                else:
                    return None
            s += lp
        return s

    got = score(out)
    n = len(word)
    best = max(
        (score([word[a:b] for a, b in zip(pos, pos[1:])])
         for cuts in itertools.product([0, 1], repeat=n - 1)
         for pos in [[0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]]
         if all(b - a <= K for a, b in zip(pos, pos[1:]))),
        key=lambda s: -float("inf") if s is None else s)
    assert got == best


@settings(max_examples=100, deadline=None)
@given(n=st.integers(0, 4), h=st.integers(1, 12), w=st.integers(1, 12),
       seed=st.integers(0, 10**6))
def test_y4m_roundtrip_arbitrary_shapes(n, h, w, seed):
    """build_y4m → _parse_y4m is identity for ANY frame stack shape —
    the codec-free video path's losslessness contract."""
    from faisssearcher_spark.operators.multimodal import (_parse_y4m,
                                                          build_y4m)

    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    w2, h2, back = _parse_y4m(build_y4m(fr))
    assert (w2, h2) == (w, h)
    assert back.shape == (n, h, w) and (back == fr).all()


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 10**6), shift=st.integers(0, 100),
       hs=st.integers(1, 8))
def test_dhash_is_brightness_shift_invariant(seed, shift, hs):
    """dHash compares ADJACENT pixels, so a uniform brightness shift
    (the classic re-encode artifact) never changes a single bit — the
    property that makes it a near-dup fingerprint rather than a
    checksum. Also: the packed value always fits a signed 64-bit long
    (Spark LongType)."""
    from faisssearcher_spark.operators.multimodal import _dhash_from_gray

    rng = np.random.default_rng(seed)
    gray = rng.integers(0, 155, size=(hs, hs + 1)).astype(np.float64)
    a = _dhash_from_gray(gray, hs)
    b = _dhash_from_gray(gray + shift, hs)
    assert a == b
    assert -(1 << 63) <= a < (1 << 63)


@settings(max_examples=300, deadline=None)
@given(bits=st.integers(1, 64), data=st.data())
def test_pigeonhole_band_guarantee(bits, data):
    """The recall contract every Hamming path rests on (hamming_pairs,
    FingerprintStore, video pairs): ANY two fingerprints within
    max_hamming bits share at least one full band of the
    hamming_band_widths plan; and the plan exactly partitions the
    fingerprint."""
    from faisssearcher_spark.operators.dedup import hamming_band_widths

    max_h = data.draw(st.integers(0, bits - 1))
    widths = hamming_band_widths(bits, max_h)
    assert sum(widths) == bits and len(widths) == max_h + 1
    val = data.draw(st.integers(0, (1 << bits) - 1))
    n_flip = data.draw(st.integers(0, max_h))
    flips = data.draw(st.lists(st.integers(0, bits - 1),
                               min_size=n_flip, max_size=n_flip,
                               unique=True))
    other = val
    for p in flips:
        other ^= 1 << p

    def bands(v):
        out, off = [], 0
        for w in widths:
            out.append((v >> off) & ((1 << w) - 1))
            off += w
        return out

    assert any(x == y for x, y in zip(bands(val), bands(other)))
