"""tokens_col / pre_tokenized paths produce IDENTICAL results to the
text-tokenizing defaults (round 6: share-one-tokenize-scan plumbing —
fingerprints, chunking, span removal, perplexity, classifier scoring,
decontamination). A silent divergence here would corrupt every pipeline
that passes a shared token array."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.functions import text as T


@pytest.fixture(scope="module")
def toked(documents):
    return documents.select("doc_id", "text",
                            T.tokens("text").alias("__toks"))


def _same(a, b):
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestTokensColEquality:
    def test_fingerprints(self, documents, toked):
        from faisssearcher_spark.operators.text_analysis import fingerprints
        _same(fingerprints(documents),
              fingerprints(toked, tokens_col="__toks"))

    def test_chunk_documents(self, documents, toked):
        from faisssearcher_spark.operators.text_analysis import \
            chunk_documents
        _same(chunk_documents(documents, max_tokens=16, overlap=4),
              chunk_documents(toked, max_tokens=16, overlap=4,
                              tokens_col="__toks"))

    def test_remove_duplicate_spans(self, documents, toked):
        from faisssearcher_spark.operators.dedup import \
            remove_duplicate_spans
        _same(remove_duplicate_spans(documents, n=8),
              remove_duplicate_spans(toked, n=8, tokens_col="__toks"))

    def test_unigram_logppl(self, documents, toked):
        from faisssearcher_spark.operators.text_analysis import (
            fit_token_frequencies, unigram_logppl)
        lm = fit_token_frequencies(
            documents.filter(F.col("doc_id") % 3 == 0))
        _same(unigram_logppl(documents, lm),
              unigram_logppl(toked.drop("__toks")
                             .withColumn("__toks", T.tokens("text")),
                             lm, tokens_col="__toks"))

    def test_classifier_score(self, spark, documents, toked):
        from faisssearcher_spark.operators.classifier import \
            QualityClassifier
        vocab = (documents.select(F.explode(T.tokens("text"))
                                  .alias("token")).distinct()
                 .withColumn("weight",
                             (T.md5_int("token") % 1000) / 1000.0 - 0.5))
        clf = QualityClassifier(vocab, -0.1)
        a = clf.score(documents.select("doc_id", "text")) \
            .select("doc_id", F.round("quality_score", 9).alias("q"))
        b = clf.score(toked, tokens_col="__toks") \
            .select("doc_id", F.round("quality_score", 9).alias("q"))
        _same(a, b)

    def test_decontaminate(self, documents, toked):
        from faisssearcher_spark.operators.decontam import decontaminate
        ev = documents.orderBy("doc_id").limit(5).select("doc_id", "text")
        a = decontaminate(documents.select("doc_id", "text"), ev, n=6,
                          min_overlap_fraction=0.4)
        b = decontaminate(toked, ev, n=6, min_overlap_fraction=0.4,
                          train_tokens_col="__toks") \
            .select("doc_id", "text")
        _same(a.select("doc_id"), b.select("doc_id"))

    def test_minhash_lsh_join(self, documents, toked):
        from faisssearcher_spark.operators.dedup import minhash_lsh_join
        _same(minhash_lsh_join(documents, num_hashes=16, bands=4,
                               shingle_n=3, verify_threshold=0.3),
              minhash_lsh_join(toked, num_hashes=16, bands=4,
                               shingle_n=3, verify_threshold=0.3,
                               tokens_col="__toks"))

    def test_word_ngrams_pre_tokenized(self, documents):
        a = documents.select(
            F.md5(F.array_join(T.word_ngrams("text", 3), "|")).alias("h"))
        b = documents.select(T.tokens("text").alias("t")).select(
            F.md5(F.array_join(
                T.word_ngrams("t", 3, pre_tokenized=True), "|"))
            .alias("h"))
        _same(a, b)

    def test_fingerprint_rolling_hash_pre_tokenized(self, documents):
        a = documents.select(T.fingerprint("text").alias("f"),
                             T.rolling_hash("text").alias("r"))
        b = documents.select(T.tokens("text").alias("t")).select(
            T.fingerprint("t", pre_tokenized=True).alias("f"),
            T.rolling_hash("t", pre_tokenized=True).alias("r"))
        _same(a, b)
