"""End-to-end pretraining prep (operators/curate.py:
prepare_pretraining_data) — the full composed path over real testdata.

Semantics pinned here: output chunks come only from curate survivors;
chunk size respects the window; packing is deterministic and bins
respect the budget for multi-chunk bins; the perplexity/classifier/
decontamination stages each strictly filter when enabled; reruns
produce the identical corpus.
"""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.curate import (curate_documents,
                                                  prepare_pretraining_data)


@pytest.fixture(scope="module")
def corpus(documents):
    return documents.select("doc_id", "text", "source").cache()


@pytest.fixture(scope="module")
def prepared(corpus):
    ref = corpus.filter(F.col("source") == "src1").select("doc_id", "text")
    ev = corpus.orderBy("doc_id").limit(5).select("doc_id", "text")
    # alpha=2: on this synthetic corpus src1 and the pool share one token
    # distribution, so classifier scores sit at the class prior and the
    # paper's alpha=9 keeps ~(2-p)^-9 ~ 0.5%% of rows — a separable real
    # corpus is what alpha=9 is calibrated for
    return prepare_pretraining_data(
        corpus.select("doc_id", "text"), reference=ref, eval_docs=ev,
        classifier_alpha=2.0,
        chunk_max_tokens=64, pack_budget=256, pack_shards=4).cache()


def test_output_shape_and_nonempty(prepared):
    assert prepared.columns == ["doc_id", "chunk_idx", "chunk_text",
                                "n_tokens", "shard", "bin"]
    assert prepared.count() > 0


def test_chunks_respect_window_and_come_from_survivors(corpus, prepared):
    assert prepared.filter(F.col("n_tokens") > 64).count() == 0
    survivors = {r["doc_id"] for r in curate_documents(
        corpus.select("doc_id", "text")).select("doc_id").collect()}
    out_ids = {r["doc_id"]
               for r in prepared.select("doc_id").distinct().collect()}
    assert out_ids <= survivors
    # the LM/classifier/decontam stages each cut something on this corpus
    assert len(out_ids) < len(survivors)


def test_bins_respect_budget(prepared):
    bins = (prepared.groupBy("shard", "bin")
            .agg(F.sum("n_tokens").alias("tot"),
                 F.count("*").alias("n")).collect())
    # greedy cut: a bin only exceeds the budget through its LAST chunk,
    # so any bin with 2+ chunks stays under budget + max_chunk
    for r in bins:
        if r["n"] > 1:
            assert r["tot"] <= 256 + 64


def test_deterministic_rerun(corpus, prepared):
    ref = corpus.filter(F.col("source") == "src1").select("doc_id", "text")
    ev = corpus.orderBy("doc_id").limit(5).select("doc_id", "text")
    again = prepare_pretraining_data(
        corpus.select("doc_id", "text"), reference=ref, eval_docs=ev,
        classifier_alpha=2.0,
        chunk_max_tokens=64, pack_budget=256, pack_shards=4)
    a = sorted(map(tuple, prepared.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_stages_are_optional(corpus):
    out = prepare_pretraining_data(corpus.select("doc_id", "text"),
                                   chunk_max_tokens=64, pack_budget=256)
    survivors = curate_documents(corpus.select("doc_id", "text")) \
        .select("doc_id")
    assert out.select("doc_id").distinct().count() == survivors.count()


def test_write_training_shards_roundtrip(spark, prepared, tmp_path):
    from faisssearcher_spark.operators.curate import write_training_shards

    path = str(tmp_path / "shards_out")
    manifest = write_training_shards(prepared, path)
    back = spark.read.parquet(path + "/shards")
    assert back.count() == prepared.count()
    got = {r["shard"]: (r["n"], r["t"])
           for r in back.groupBy("shard")
           .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
           .collect()}
    assert set(got) == set(manifest)
    for s, (n, t) in got.items():
        assert manifest[s]["n_chunks"] == n
        assert manifest[s]["n_tokens"] == t
    mdf = spark.read.parquet(path + "/_manifest")
    assert mdf.count() == len(manifest)


class TestPrepareSftData:
    def test_end_to_end(self, spark):
        from faisssearcher_spark.operators import conversations as C
        from faisssearcher_spark.operators.curate import prepare_sft_data

        rows = [
            # valid, clean
            (0, [("user", "explain spark joins please"),
                 ("assistant", "they combine frames on keys")]),
            # duplicate of 0 (same rendered text) -> deduped
            (1, [("user", "explain spark joins please"),
                 ("assistant", "they combine frames on keys")]),
            # invalid structure (assistant first)
            (2, [("assistant", "no question")]),
            # blocklisted content
            (3, [("user", "something forbidden here"),
                 ("assistant", "reply")]),
            # too short
            (4, [("user", "a"), ("assistant", "b")]),
        ]
        convs = spark.createDataFrame(
            rows, f"conv_id long, messages {C.MESSAGES_TYPE}")
        out = prepare_sft_data(convs, min_tokens=5,
                               blocklist=["forbidden"])
        got = out.collect()
        assert [r["conv_id"] for r in got] == [0]
        assert "<|user|>" in got[0]["text"]
        assert got[0]["roles_valid"] is True

    def test_feeds_chunk_pack(self, spark):
        from faisssearcher_spark.operators import conversations as C
        from faisssearcher_spark.operators.curate import prepare_sft_data
        from faisssearcher_spark.operators.sampling import pack_token_budget
        from faisssearcher_spark.operators.text_analysis import \
            chunk_documents

        rows = [(i, [("user", f"question {i} " + "tok " * 40),
                     ("assistant", "answer " * 30)]) for i in range(6)]
        convs = spark.createDataFrame(
            rows, f"conv_id long, messages {C.MESSAGES_TYPE}")
        sft = prepare_sft_data(convs).select(
            F.col("conv_id").alias("doc_id"), "text")
        chunks = chunk_documents(sft, max_tokens=32)
        packed = pack_token_budget(
            chunks.select(
                F.concat_ws("_", "doc_id", "chunk_idx").alias("key"),
                F.col("n_chunk_tokens")),
            budget=64, size_col="n_chunk_tokens", key_col="key",
            n_shards=4)
        assert packed.count() > 0
