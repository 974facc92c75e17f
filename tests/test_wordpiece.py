"""WordPiece tokenizer (operators/wordpiece.py)."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.wordpiece import (CONT, UNK,
                                                     WordPieceTokenizer,
                                                     _train_wordpiece,
                                                     encode_word)


class TestEncodeWord:
    VOCAB = {"a", "b", "un", "##a", "##b", "##able", "##ab", "ab"}

    def test_longest_match_first(self):
        # "unab" -> "un" + "##ab" (greedy longest at each position)
        assert encode_word("unab", self.VOCAB, 4) == ["un", "##ab"]

    def test_greedy_not_optimal(self):
        """Longest-match is greedy, not globally optimal: 'abc' under
        {ab, a, ##bc} takes 'ab' first, dead-ends on 'c' and collapses
        to UNK even though a + ##bc exists — the documented BERT
        behavior, not a bug."""
        assert encode_word("aable", self.VOCAB, 5) == ["a", "##able"]
        assert encode_word("abc", {"ab", "a", "##bc"}, 2) == [UNK]

    def test_oov_char_is_unk(self):
        assert encode_word("axb", self.VOCAB, 4) == [UNK]

    def test_word_initial_vs_continuation(self):
        # bare 'b' in vocab but '##b' drives the non-initial match
        assert encode_word("ab", {"a", "##b"}, 2) == ["a", "##b"]
        assert encode_word("ab", {"a", "b"}, 2) == [UNK]

    def test_max_word_len_short_circuits(self):
        assert encode_word("ab" * 60, self.VOCAB, 4,
                           max_word_len=100) == [UNK]

    def test_brute_force_parity(self):
        """Greedy longest-match against a direct reimplementation over
        random words/vocabs."""
        import random

        rng = random.Random(7)
        for _ in range(200):
            letters = "abcd"
            vocab = {rng.choice(letters) for _ in range(3)}
            vocab |= {CONT + rng.choice(letters) for _ in range(3)}
            for _ in range(4):
                w = "".join(rng.choice(letters)
                            for _ in range(rng.randint(2, 3)))
                vocab.add(w if rng.random() < 0.5 else CONT + w)
            word = "".join(rng.choice(letters)
                           for _ in range(rng.randint(1, 8)))

            def ref(word):
                out, pos = [], 0
                while pos < len(word):
                    for k in range(min(3, len(word) - pos), 0, -1):
                        p = word[pos:pos+k] if pos == 0 \
                            else CONT + word[pos:pos+k]
                        if p in vocab:
                            out.append(p)
                            pos += k
                            break
                    else:
                        return [UNK]
                return out

            assert encode_word(word, vocab, 3) == ref(word)


class TestTraining:
    PAIRS = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]

    def test_vocab_contains_all_initial_symbols(self):
        vocab = _train_wordpiece(self.PAIRS, 0)
        for w, _ in self.PAIRS:
            assert w[0] in vocab
            for c in w[1:]:
                assert CONT + c in vocab

    def test_merges_grow_vocab_deterministically(self):
        a = _train_wordpiece(self.PAIRS, 10)
        b = _train_wordpiece(list(reversed(self.PAIRS)), 10)
        assert a == b
        assert len(a) > len(_train_wordpiece(self.PAIRS, 0))

    def test_likelihood_beats_frequency(self):
        """'q' and '##z' always co-occur (count 3 each, pair 3 →
        score 1/3); 'a'+'##b' is more FREQUENT (pair 30) but both
        symbols are ubiquitous (count 60 → score 30/3600). WordPiece
        must merge qz first — the criterion that distinguishes it
        from BPE."""
        pairs = [("qz", 3), ("ab", 30), ("ba", 30)]
        vocab = _train_wordpiece(pairs, 1)
        assert "qz" in vocab and "ab" not in vocab

    def test_singleton_pairs_never_merge(self):
        vocab = _train_wordpiece([("xy", 1)], 5)
        assert "xy" not in vocab


@pytest.fixture(scope="module")
def trained(documents):
    return WordPieceTokenizer.train(documents, n_merges=24)


class TestTokenizer:
    def test_train_deterministic(self, documents, trained):
        again = WordPieceTokenizer.train(documents, n_merges=24)
        assert again.vocab == trained.vocab

    def test_encode_covers_corpus_without_unk(self, documents, trained):
        """Every corpus word's chars are in the trained initial symbol
        set, so nothing should UNK on the training corpus itself."""
        n_unk = documents.select(
            F.explode(trained.encode_expr("text")).alias("t")) \
            .filter(F.col("t") == UNK).count()
        assert n_unk == 0

    def test_spark_encode_matches_driver(self, documents, trained):
        rows = documents.select(
            "doc_id", "text",
            trained.encode_expr("text").alias("toks")).collect()
        vocab = set(trained.vocab)
        for r in rows[:50]:
            want = []
            for w in r["text"].split():
                want.extend(encode_word(w, vocab,
                                        trained.max_piece_len))
            assert r["toks"] == want

    def test_token_counts(self, documents, trained):
        out = trained.token_counts(documents)
        assert out.columns == ["doc_id", "n_wordpiece_tokens"]
        assert out.filter(F.col("n_wordpiece_tokens") <= 0).count() == 0

    def test_null_text_encodes_empty(self, spark, trained):
        df = spark.createDataFrame([(1, None)], "doc_id long, text string")
        assert df.select(trained.encode_expr("text").alias("t")) \
            .first()["t"] == []

    def test_roundtrip(self, spark, tmp_path, trained):
        path = str(tmp_path / "wp")
        trained.save(spark, path)
        back = WordPieceTokenizer.load(spark, path)
        assert back.vocab == trained.vocab
        assert back.max_word_len == trained.max_word_len
        assert back.max_piece_len == trained.max_piece_len

    def test_duplicate_vocab_rejected(self):
        with pytest.raises(ValueError, match="duplicate"):
            WordPieceTokenizer(["a", "a"])


class TestGateTable:
    def test_fixed_vocab_freeze_matches_train(self, documents, sf_dir):
        """The frozen registry table IS the deterministic train output
        on sf0.01 — regenerate and compare when that's the fixture sf."""
        if "sf0.01" not in sf_dir:
            pytest.skip("frozen table derives from sf0.01")
        from faisssearcher_spark.registry import FIXED_WORDPIECE_VOCAB
        tok = WordPieceTokenizer.train(documents, n_merges=24)
        assert list(FIXED_WORDPIECE_VOCAB) == tok.vocab
