"""Parity pin for registry._fused_subword_expr (r13, guide §4): the
single-Arrow-pass struct encode must be field-for-field identical to the
three tokenizers' independent ``encode_expr`` passes — the fusion is a
boundary-crossing optimization, never a semantic change. The declared
``text_token_stats`` output built on it stays oracle-gated end to end.
"""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.bpe import BPETokenizer
from faisssearcher_spark.operators.unigram import UnigramTokenizer
from faisssearcher_spark.operators.wordpiece import WordPieceTokenizer
from faisssearcher_spark.registry import (FIXED_BPE_MERGES,
                                          FIXED_UNIGRAM_PIECES,
                                          FIXED_WORDPIECE_VOCAB,
                                          _fused_subword_expr)


@pytest.fixture(scope="module")
def toks():
    return (BPETokenizer(FIXED_BPE_MERGES),
            UnigramTokenizer(dict(FIXED_UNIGRAM_PIECES)),
            WordPieceTokenizer(FIXED_WORDPIECE_VOCAB))


def test_fused_matches_independent_encodes(spark, toks):
    bpe, uni, wp = toks
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "a b c d"),
         (2, ""), (3, None), (4, "  leading and trailing  "),
         (5, "word nbsp stays one token"),  # the \s+ trap: ASCII split only
         (6, "repetition repetition repetition")],
        "doc_id long, text string")
    fused = docs.select(
        "doc_id", _fused_subword_expr(bpe, uni, wp, "text").alias("e"))
    got = {r["doc_id"]: (r["e"]["bpe"], r["e"]["uni"], r["e"]["wp"])
           for r in fused.collect()}
    indep = docs.select(
        "doc_id",
        bpe.encode_expr("text").alias("b"),
        uni.encode_expr("text").alias("u"),
        wp.encode_expr("text").alias("w"))
    want = {r["doc_id"]: (r["b"], r["u"], r["w"])
            for r in indep.collect()}
    assert got == want


def test_fused_matches_on_documents_fixture(spark, documents):
    bpe, uni, wp = toks_ = (BPETokenizer(FIXED_BPE_MERGES),
                            UnigramTokenizer(dict(FIXED_UNIGRAM_PIECES)),
                            WordPieceTokenizer(FIXED_WORDPIECE_VOCAB))
    fused = documents.select(
        "doc_id", _fused_subword_expr(bpe, uni, wp, "text").alias("e")) \
        .select("doc_id",
                F.md5(F.concat_ws(" ", F.col("e.bpe"))).alias("bh"),
                F.md5(F.concat_ws(" ", F.col("e.uni"))).alias("uh"),
                F.md5(F.concat_ws(" ", F.col("e.wp"))).alias("wh"))
    indep = documents.select(
        "doc_id",
        F.md5(F.concat_ws(" ", bpe.encode_expr("text"))).alias("bh"),
        F.md5(F.concat_ws(" ", uni.encode_expr("text"))).alias("uh"),
        F.md5(F.concat_ws(" ", wp.encode_expr("text"))).alias("wh"))
    assert (sorted(map(tuple, fused.collect()))
            == sorted(map(tuple, indep.collect())))
