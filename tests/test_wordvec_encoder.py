"""WordVecEncoder: pretrained-weight load (S7 parity) as a table + join.

The reference restores encoder weights from a checkpoint into process
memory (bert_encoder.py:239, :263-283); here weights are a parquet table
and encoding is a relational plan — these tests pin load/save roundtrip,
the DataFrame path vs the protocol path, OOV/duplicate policy, and the
SparkSearcher integration.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.encoders import WordVecEncoder
from faisssearcher_spark.searcher import SparkSearcher


@pytest.fixture(scope="module")
def weights_df(spark):
    rows = [("apple", [1.0, 0.0, 0.0]),
            ("pie", [0.0, 1.0, 0.0]),
            ("spark", [0.0, 0.0, 1.0]),
            ("join", [0.5, 0.5, 0.0])]
    return spark.createDataFrame(rows, "token string, vector array<float>")


@pytest.fixture(scope="module")
def enc(weights_df):
    return WordVecEncoder.from_dataframe(weights_df)


class TestWordVecEncoder:
    def test_dim_discovered(self, enc):
        assert enc.dim == 3

    def test_mean_encoding(self, enc):
        out = enc.encode(["apple pie"])
        assert out.shape == (1, 3)
        assert out[0] == pytest.approx([0.5, 0.5, 0.0])

    def test_sum_mode(self, weights_df):
        enc = WordVecEncoder.from_dataframe(weights_df, mode="sum")
        out = enc.encode(["apple pie"])
        assert out[0] == pytest.approx([1.0, 1.0, 0.0])

    def test_oov_and_empty_are_zero(self, enc):
        out = enc.encode(["zzz qqq", ""])
        assert np.allclose(out, 0.0)

    def test_encode_df_matches_protocol(self, spark, enc):
        texts = ["apple pie", "spark join", "apple zzz", "", "join join pie"]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "doc_id long, text string")
        got = {r["doc_id"]: np.array(r["embedding"])
               for r in enc.encode_df(df).collect()}
        want = enc.encode(texts)
        for i in range(len(texts)):
            assert got[i] == pytest.approx(want[i], abs=1e-6), i

    def test_encode_df_no_python_on_data_path(self, spark, enc):
        from faisssearcher_spark.plans import inspect
        df = spark.createDataFrame([(0, "apple pie")],
                                   "doc_id long, text string")
        plan = inspect.executed_plan(enc.encode_df(df))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_duplicate_tokens_resolve_deterministically(self, spark):
        rows = [("tok", [1.0, 0.0]), ("tok", [2.0, 0.0])]
        w = spark.createDataFrame(rows, "token string, vector array<float>")
        enc = WordVecEncoder.from_dataframe(w)
        assert enc.encode(["tok"])[0] == pytest.approx([1.0, 0.0])

    def test_encode_df_keeps_duplicate_rows(self, spark, enc):
        # corpus with no unique id: fully-duplicate rows must each get an
        # embedding, not collapse through the fold's grouping (ADVICE r4)
        df = spark.createDataFrame(
            [("apple pie",)] * 3 + [("spark join",)], "text string")
        out = enc.encode_df(df).collect()
        assert len(out) == 4
        assert sum(r["text"] == "apple pie" for r in out) == 3

    def test_encode_df_nongroupable_column_types(self, spark, enc):
        # map-typed payload columns are not groupable; the row-key fold
        # must carry them through untouched (ADVICE r4)
        df = spark.createDataFrame(
            [(0, "apple pie", {"k": "v"})],
            "doc_id long, text string, props map<string,string>")
        row = enc.encode_df(df).collect()[0]
        assert row["props"] == {"k": "v"}
        assert np.array(row["embedding"]) == pytest.approx([0.5, 0.5, 0.0])

    def test_save_load_roundtrip(self, spark, enc, tmp_path):
        path = str(tmp_path / "weights")
        enc.save(path)
        loaded = WordVecEncoder.load(spark, path)
        texts = ["apple pie spark"]
        assert loaded.encode(texts) == pytest.approx(enc.encode(texts))

    def test_driver_vocab_bound_enforced(self, weights_df):
        enc = WordVecEncoder.from_dataframe(weights_df, max_driver_vocab=2)
        with pytest.raises(ValueError, match="max_driver_vocab"):
            enc.encode(["apple"])

    def test_empty_weights_raise(self, spark):
        w = spark.createDataFrame([], "token string, vector array<float>")
        with pytest.raises(ValueError, match="empty"):
            WordVecEncoder.from_dataframe(w)

    def test_searcher_integration(self, spark, weights_df):
        corpus = spark.createDataFrame(
            [("apple pie", 1), ("spark join", 2), ("apple spark", 3)],
            "text string, pid int")
        enc = WordVecEncoder.from_dataframe(weights_df)
        s = SparkSearcher(corpus, encoder=enc, measurement="cos").train()
        top = s.search(["apple pie"], topK=1, score_scale=4).collect()[0]
        assert top["sim_item"] == "apple pie"
        assert top["sim_val"] == pytest.approx(1.0, abs=1e-4)
        assert top["pid"] == 1  # payload carried
