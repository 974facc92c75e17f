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


class TestSif:
    """SIF weighted pooling (Arora et al. 2017): a/(a+p) token weights
    folded into the weight table + first-component removal."""

    A = 0.01

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(0, "apple apple apple pie"), (1, "apple spark"),
                (2, "pie apple apple")]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.fixture(scope="class")
    def sif_enc(self, weights_df, corpus):
        probs = WordVecEncoder.fit_sif_probs(corpus)
        return WordVecEncoder.from_dataframe(
            weights_df, mode="sif", sif_probs=probs, sif_a=self.A)

    def test_probs_sum_to_one(self, corpus):
        probs = WordVecEncoder.fit_sif_probs(corpus)
        total = probs.agg(F.sum("p")).first()[0]
        assert total == pytest.approx(1.0, abs=1e-12)
        p = {r["token"]: r["p"] for r in probs.collect()}
        assert p["apple"] == pytest.approx(6 / 9)
        assert p["pie"] == pytest.approx(2 / 9)

    def test_encode_df_matches_manual(self, sif_enc, corpus):
        out = {r["doc_id"]: np.array(r["embedding"]) for r in
               sif_enc.encode_df(corpus).collect()}
        vec = {"apple": np.array([1.0, 0, 0]), "pie": np.array([0, 1.0, 0]),
               "spark": np.array([0, 0, 1.0])}
        p = {"apple": 6 / 9, "pie": 2 / 9, "spark": 1 / 9}
        w = {t: self.A / (self.A + p[t]) for t in p}
        doc0 = (3 * w["apple"] * vec["apple"] + w["pie"] * vec["pie"]) / 4
        assert out[0] == pytest.approx(doc0, rel=1e-6)
        doc1 = (w["apple"] * vec["apple"] + w["spark"] * vec["spark"]) / 2
        assert out[1] == pytest.approx(doc1, rel=1e-6)

    def test_protocol_path_matches_df_path(self, sif_enc, corpus):
        texts = [r["text"] for r in corpus.orderBy("doc_id").collect()]
        proto = sif_enc.encode(texts)
        df = np.array([r["embedding"] for r in
                       sif_enc.encode_df(corpus).orderBy("doc_id").collect()])
        assert proto == pytest.approx(df, rel=1e-5)

    def test_stopword_downweighted(self, sif_enc, corpus):
        """'apple' dominates the corpus; SIF must shrink its share of a
        mixed document relative to plain mean pooling."""
        mixed = corpus.sparkSession.createDataFrame(
            [(0, "apple spark")], "doc_id long, text string")
        sif = np.array(sif_enc.encode_df(mixed).first()["embedding"])
        assert sif[2] > sif[0]     # rare 'spark' outweighs frequent 'apple'

    def test_sif_requires_probs(self, weights_df):
        with pytest.raises(ValueError, match="sif_probs"):
            WordVecEncoder.from_dataframe(weights_df, mode="sif")


class TestComponentRemoval:
    def test_fit_recovers_dominant_direction(self, spark):
        from faisssearcher_spark.encoders.wordvec import (fit_first_component,
                                                          remove_component)
        rng = np.random.default_rng(0)
        u = np.array([0.6, 0.8, 0.0])
        mat = np.outer(rng.uniform(1, 2, 200), u) \
            + 0.01 * rng.standard_normal((200, 3))
        df = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(mat)],
            "vec_id long, embedding array<float>")
        comp = fit_first_component(df)
        assert np.abs(comp @ u) == pytest.approx(1.0, abs=1e-3)
        cleaned = remove_component(df, comp)
        res = np.array([r["embedding"] for r in cleaned.collect()])
        assert np.abs(res @ comp).max() < 1e-3   # orthogonal residual
        # deterministic sign: first non-zero entry positive
        assert comp[np.flatnonzero(np.abs(comp) > 1e-12)[0]] > 0

    def test_zero_component_rejected(self, spark):
        from faisssearcher_spark.encoders.wordvec import remove_component
        df = spark.createDataFrame([(0, [1.0, 2.0])],
                                   "id long, embedding array<float>")
        with pytest.raises(ValueError, match="non-zero"):
            remove_component(df, [0.0, 0.0])


class TestSifPersistence:
    def test_save_load_roundtrip_no_double_weighting(self, weights_df,
                                                     spark, tmp_path_factory):
        """save() must persist PRE-SIF weights: reloading with
        mode='sif' re-applies a/(a+p) exactly once (review finding —
        saving the folded vectors would square the weights)."""
        corpus = spark.createDataFrame(
            [(0, "apple apple pie"), (1, "apple spark")],
            "doc_id long, text string")
        probs = WordVecEncoder.fit_sif_probs(corpus)
        enc = WordVecEncoder.from_dataframe(
            weights_df, mode="sif", sif_probs=probs, sif_a=0.01)
        path = str(tmp_path_factory.mktemp("sifenc") / "w")
        enc.save(path)
        reloaded = WordVecEncoder.load(spark, path, mode="sif",
                                       sif_probs=probs, sif_a=0.01)
        a = enc.encode(["apple spark pie"])
        b = reloaded.encode(["apple spark pie"])
        assert a == pytest.approx(b, rel=1e-6)
