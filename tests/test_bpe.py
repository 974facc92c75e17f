"""BPE tokenizer (operators/bpe.py): distributed word counting, driver
merge training on the type table, vectorized encode.

Semantics pinned here: the Sennrich merge order on a known corpus, the
greedy lowest-rank encoder, concatenation-reconstructs-the-word (with
the </w> marker), determinism across training runs, merge-table
save/load, and the min-frequency stop (no memorizing singleton pairs).
"""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.bpe import (BPETokenizer, END,
                                               _encode_word,
                                               _train_merges,
                                               word_frequencies)


def test_known_merge_order():
    """The textbook example: with 'low'x5 and 'lower'x2, the most
    frequent pair is (l, o) with freq 7, then (lo, w)."""
    merges = _train_merges([("low", 5), ("lower", 2)], n_merges=4)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # 'low' ends: (low, </w>) freq 5 beats lower's continuations
    assert merges[2] == ("low", END)


def test_singleton_pairs_never_merge():
    merges = _train_merges([("abc", 1)], n_merges=10)
    assert merges == []   # every pair occurs once -> stop, no memorization


def test_encoder_applies_ranks_greedily():
    merges = _train_merges([("low", 5), ("lower", 2)], n_merges=3)
    ranks = {p: i for i, p in enumerate(merges)}
    assert _encode_word("low", ranks) == ["low" + END]
    assert _encode_word("lower", ranks) == ["low", "e", "r", END]
    # unseen word falls back to characters + marker
    assert _encode_word("zz", ranks) == ["z", "z", END]


def test_train_encode_roundtrip_on_corpus(spark, documents):
    tok = BPETokenizer.train(documents, n_merges=200)
    assert len(tok.merges) > 50   # real corpus yields a real vocabulary
    enc = documents.select(
        "doc_id",
        T_tokens_size("text").alias("n_words"),
        tok.encode_expr("text").alias("toks"),
        tok.token_count_expr("text").alias("n_bpe"))
    rows = enc.collect()
    for r in rows:
        # one </w> per word: concatenating the subwords reconstructs the
        # document's words exactly
        joined = "".join(r["toks"])
        assert joined.count(END) == r["n_words"]
        assert r["n_bpe"] == len(r["toks"])
        # merges compress: never more symbols than characters+markers
        assert r["n_bpe"] <= sum(len(w) + 1 for w in joined.split(END) if w) \
            + r["n_words"]


def T_tokens_size(c):
    from faisssearcher_spark.functions.text import tokens
    return F.size(tokens(c))


def test_training_is_deterministic(spark, documents):
    a = BPETokenizer.train(documents, n_merges=50).merges
    b = BPETokenizer.train(documents.repartition(7), n_merges=50).merges
    assert a == b


def test_word_frequencies_cap_is_deterministic(spark, documents):
    top = word_frequencies(documents, max_word_types=10).collect()
    assert len(top) == 10
    freqs = [r["freq"] for r in top]
    assert freqs == sorted(freqs, reverse=True)


def test_save_load_roundtrip(spark, documents, tmp_path):
    tok = BPETokenizer.train(documents, n_merges=60)
    path = str(tmp_path / "bpe")
    tok.save(spark, path)
    loaded = BPETokenizer.load(spark, path)
    assert loaded.merges == tok.merges
    sample = documents.limit(3).select(
        tok.encode_expr("text").alias("a"),
        loaded.encode_expr("text").alias("b")).collect()
    for r in sample:
        assert r["a"] == r["b"]


def test_empty_and_null_text(spark):
    tok = BPETokenizer([("a", "b")])
    df = spark.createDataFrame([(1, ""), (2, None), (3, "ab")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r["toks"] for r in df.select(
        "doc_id", tok.encode_expr("text").alias("toks")).collect()}
    assert out[1] == [] and out[2] == []
    assert out[3] == ["ab", END]
