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
