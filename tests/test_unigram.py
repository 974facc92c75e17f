"""Unigram LM tokenizer (operators/unigram.py)."""

import itertools
import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.unigram import (UNK_LOGP,
                                                   UnigramTokenizer,
                                                   viterbi_segment)


def _brute_force_best(word: str, logp: dict[str, float],
                      max_piece_len: int):
    """Enumerate every segmentation; return (score, pieces) under the
    engine's tie rule (higher score, then longer pieces from the end)."""
    n = len(word)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pos = [0] + [i + 1 for i, c in enumerate(cuts) if c] + [n]
        pieces = [word[a:b] for a, b in zip(pos, pos[1:])]
        if any(len(p) > max_piece_len for p in pieces):
            continue
        s = 0.0
        ok = True
        for p in pieces:
            lp = logp.get(p)
            if lp is None:
                if len(p) == 1:
                    lp = UNK_LOGP
                else:
                    ok = False
                    break
            s += lp
        if not ok:
            continue
        # tie rule: compare piece lengths right-to-left, longer wins
        key = (s, tuple(len(p) for p in reversed(pieces)))
        if best is None or key > best[0]:
            best = (key, pieces)
    return best[1]


class TestViterbi:
    LOGP = {"a": -1.0, "b": -2.0, "c": -3.0, "ab": -2.5, "bc": -2.2,
            "abc": -6.0, "ca": -1.4}

    def test_matches_brute_force(self):
        for word in ("abc", "abca", "cab", "bcbc", "aabbcc", "cacaca"):
            got = viterbi_segment(word, self.LOGP, 3)
            want = _brute_force_best(word, self.LOGP, 3)
            assert got == want, (word, got, want)
            assert "".join(got) == word

    def test_tie_prefers_longer_final_piece(self):
        logp = {"a": -1.0, "b": -1.0, "ab": -2.0}   # 'a'+'b' == 'ab'
        assert viterbi_segment("ab", logp, 2) == ["ab"]

    def test_oov_chars_fall_back_to_singles(self):
        assert viterbi_segment("axb", {"a": -1.0, "b": -1.0}, 3) == \
            ["a", "x", "b"]

    def test_oov_never_beats_real_path(self):
        logp = {"a": -40.0, "b": -40.0, "ab": -45.0}
        # even expensive real pieces beat a single UNK_LOGP=-1000 char
        assert viterbi_segment("ab", logp, 2) == ["ab"]


@pytest.fixture(scope="module")
def trained(documents):
    return UnigramTokenizer.train(documents, vocab_size=48,
                                  max_piece_len=6)


class TestTraining:
    def test_vocab_size_and_chars(self, documents, trained):
        assert len(trained.pieces) <= 48
        chars = set("".join(
            r["text"] for r in documents.select("text").collect()))
        chars -= set(" \t\n\x0b\f\r")
        missing = {c for c in chars if c not in trained.pieces}
        assert not missing, f"pruned single chars: {missing}"

    def test_deterministic(self, documents, trained):
        again = UnigramTokenizer.train(documents, vocab_size=48,
                                       max_piece_len=6)
        assert trained.pieces == again.pieces

    def test_learns_multichar_pieces(self, trained):
        multi = [p for p in trained.pieces if len(p) > 1]
        assert len(multi) >= 10
        # probabilities normalize (within float slack)
        total = sum(math.exp(v) for v in trained.pieces.values())
        assert total == pytest.approx(1.0, rel=1e-6)


class TestEncode:
    def test_lossless_and_matches_driver(self, documents, trained):
        rows = documents.limit(30).select(
            "doc_id", "text",
            trained.encode_expr("text").alias("pieces")).collect()
        assert rows
        for r in rows:
            words = r["text"].split()
            assert "".join(r["pieces"]) == "".join(words)
            want = [p for w in words
                    for p in viterbi_segment(w, trained.pieces,
                                             trained.max_piece_len)]
            assert list(r["pieces"]) == want

    def test_token_counts(self, documents, trained):
        out = trained.token_counts(documents.limit(10))
        for r in out.collect():
            assert r["n_unigram_tokens"] > 0

    def test_null_text_encodes_empty(self, spark, trained):
        df = spark.createDataFrame([(None,), ("a b",)], "text string")
        got = df.select(trained.encode_expr("text").alias("p")).collect()
        assert list(got[0]["p"]) == []


class TestPersistence:
    def test_roundtrip(self, spark, tmp_path, trained):
        path = str(tmp_path / "uni")
        trained.save(spark, path)
        back = UnigramTokenizer.load(spark, path)
        assert back.pieces == trained.pieces
        assert back.max_piece_len == trained.max_piece_len


class TestVectorizedEmParity:
    """The numpy padded-lattice E-step (r8, the production path) against
    the scalar reference loop: same expected-count keys, values to float
    tolerance (bitwise parity is impossible — numpy's SIMD exp/log1p
    differ from libm by ≤1 ulp; the frozen gate table derives from the
    vectorized fit)."""

    def _pairs(self, seed, n_words=300):
        import random

        rng = random.Random(seed)
        words = {"".join(rng.choice("abcde")
                         for _ in range(rng.randint(1, 9)))
                 for _ in range(n_words)}
        return [(w, rng.randint(1, 50)) for w in sorted(words)]

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_em_round_matches_scalar(self, seed):
        from faisssearcher_spark.operators.unigram import (
            _EmLattice, _em_round, _em_round_vec, _seed_pieces)

        pairs = self._pairs(seed)
        logp = _seed_pieces(pairs, max_piece_len=5, n_seed=120)
        e_s = _em_round(pairs, logp, 5)
        e_v = _em_round_vec(_EmLattice(pairs, 5), logp)
        assert set(e_s) == set(e_v)
        for k, v in e_s.items():
            assert e_v[k] == pytest.approx(v, rel=1e-9)

    def test_full_train_matches_scalar(self, documents):
        vec = UnigramTokenizer.train(documents, vocab_size=48,
                                     max_piece_len=6)
        sca = UnigramTokenizer.train(documents, vocab_size=48,
                                     max_piece_len=6, em_impl="scalar")
        assert set(vec.pieces) == set(sca.pieces)
        for p, v in vec.pieces.items():
            assert sca.pieces[p] == pytest.approx(v, abs=1e-9)

    def test_em_impl_validated(self, documents):
        with pytest.raises(ValueError, match="em_impl"):
            UnigramTokenizer.train(documents, em_impl="nope")

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_lattice_build_and_seeds_match_scalar(self, seed):
        """The numpy char-ops lattice build (r9) against the Python
        loop build: identical substring universe, identical
        (word, pos, len) → substring mapping (ids may be permuted —
        nothing depends on the numbering), and the lexsort seeding
        BITWISE equal to _seed_pieces (integer counts are exact in
        float64, so selection, ties and normalization agree exactly —
        this is what keeps FIXED_UNIGRAM_PIECES stable)."""
        import random

        import numpy as np

        from faisssearcher_spark.operators.unigram import (
            _EmLattice, _seed_pieces, _seed_pieces_from_lattice)

        rng = random.Random(seed)
        words = {"".join(rng.choice("abcdéfg日本")
                         for _ in range(rng.randint(1, 9)))
                 for _ in range(300)}
        pairs = [(w, rng.randint(1, 50)) for w in sorted(words)]
        lat = _EmLattice(pairs, 5)
        ref = _EmLattice.__new__(_EmLattice)
        ref.words, ref.freqs = lat.words, lat.freqs
        ref.lens, ref.L, ref.K = lat.lens, lat.L, lat.K
        ref._build_py(np)
        assert set(lat.sub_list) == set(ref.sub_list)
        sv = np.array([""] + lat.sub_list, dtype="U5")[lat.S + 1]
        sr = np.array([""] + ref.sub_list, dtype="U5")[ref.S + 1]
        assert (sv == sr).all()
        assert (_seed_pieces_from_lattice(lat, 120)
                == _seed_pieces(pairs, max_piece_len=5, n_seed=120))

    def test_lattice_nul_char_falls_back(self):
        """A word with an embedded NUL (the one thing numpy 'U' views
        cannot round-trip) routes to the loop build and still trains."""
        from faisssearcher_spark.operators.unigram import _EmLattice

        lat = _EmLattice([("a\x00b", 3), ("ab", 5)], 3)
        assert "a\x00b" in lat.sub_list and "ab" in lat.sub_list


class TestGateTable:
    def test_fixed_pieces_freeze_matches_train(self, documents, sf_dir):
        """The frozen registry table IS the deterministic train output
        on sf0.01 — regenerate and compare when that's the fixture sf."""
        if "sf0.01" not in sf_dir:
            pytest.skip("frozen table derives from sf0.01")
        from faisssearcher_spark.registry import FIXED_UNIGRAM_PIECES
        tok = UnigramTokenizer.train(documents, vocab_size=48,
                                     max_piece_len=6)
        assert dict(FIXED_UNIGRAM_PIECES) == tok.pieces
