"""SparkSearcher facade: reference API parity (modes, result shapes,
feature-sep splits, persistence) — SURVEY.md §3."""

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.encoders import HashingEncoder
from faisssearcher_spark.searcher import SparkSearcher


@pytest.fixture(scope="module")
def doc_searcher(spark, documents):
    corpus = documents.select("text", "lang", "source", "n_chars")
    return SparkSearcher(corpus, encoder=HashingEncoder(dim=8),
                         measurement="cos").train()


class TestEncoderMode:
    def test_result_shape(self, doc_searcher):
        res = doc_searcher.search(["spark join merge"], topK=3,
                                  keep_rank_no=True)
        assert res.columns == ["source_item", "sim_item", "sim_val",
                               "rank_no", "lang", "source", "n_chars"]
        assert res.count() == 3

    def test_self_search_top1(self, doc_searcher, documents):
        text = documents.first()["text"]
        top = doc_searcher.search([text], topK=1).collect()[0]
        assert top["sim_item"] == text
        assert top["sim_val"] == pytest.approx(1.0, abs=1e-6)

    def test_multi_k_dict(self, doc_searcher):
        res = doc_searcher.search(["spark join"], topK=[1, 3],
                                  keep_rank_no=True)
        assert sorted(res) == [1, 3]
        assert res[1].count() == 1 and res[3].count() == 3

    def test_rank_no_dropped_by_default(self, doc_searcher):
        res = doc_searcher.search(["spark"], topK=2)
        assert "rank_no" not in res.columns

    def test_cal_sim_returns_all_ranked(self, doc_searcher):
        res = doc_searcher.cal_sim("spark join", ["spark join", "key value"])
        rows = res.collect()
        assert len(rows) == 2
        assert rows[0]["score"] >= rows[1]["score"]
        assert rows[0]["item"] == "spark join"

    def test_untrained_raises(self, documents):
        s = SparkSearcher(documents.select("text"),
                          encoder=HashingEncoder(dim=4))
        with pytest.raises(RuntimeError, match="train"):
            s.search(["x"], 1)


class TestFeatureSep:
    def test_query_and_doc_feature_sep(self, spark):
        # faiss_searcher.py:150-156: strip suffixes after the separator
        corpus = spark.createDataFrame(
            [("apple##f1", 1), ("banana##f2", 2)], "text string, pid int")
        s = SparkSearcher(corpus, encoder=HashingEncoder(dim=4),
                          measurement="cos", doc_feature_sep="##",
                          query_feature_sep="##").train()
        res = s.search(["apple##q9"], topK=1).collect()[0]
        assert res["source_item"] == "apple"
        assert res["sim_item"] == "apple"


class TestRawVectorMode:
    def test_search_with_vec_col(self, embeddings):
        s = SparkSearcher(embeddings, vec_col="embedding", key_col="vec_id",
                          measurement="l2").train()
        res = s.search(embeddings.limit(2), topK=3, keep_rank_no=True)
        assert res.count() == 6
        # self-match at rank 0 with distance 0
        top = res.filter(F.col("rank_no") == 0).collect()
        for r in top:
            assert r["sim_val"] == pytest.approx(0.0, abs=1e-9)

    def test_requires_vec_col_or_encoder(self, documents):
        with pytest.raises(TypeError, match="vector"):
            SparkSearcher(documents)


class TestPersistence:
    def test_save_load_roundtrip(self, spark, documents, tmp_path):
        corpus = documents.select("text", "lang")
        s = SparkSearcher(corpus, encoder=HashingEncoder(dim=4),
                          measurement="cos").train()
        path = str(tmp_path / "searcher")
        s.save(path)
        loaded = SparkSearcher.load(spark, path, encoder=HashingEncoder(dim=4))
        res = loaded.search(["spark join"], topK=2)
        assert res.count() == 2

    def test_load_without_encoder_raises(self, spark, documents, tmp_path):
        corpus = documents.select("text", "lang")
        s = SparkSearcher(corpus, encoder=HashingEncoder(dim=4)).train()
        path = str(tmp_path / "searcher2")
        s.save(path)
        with pytest.raises(ValueError, match="encoder"):
            SparkSearcher.load(spark, path)


class TestAddItems:
    def test_incremental_add_matches_full_retrain(self, spark, documents):
        from faisssearcher_spark.encoders import HashingEncoder
        from faisssearcher_spark.searcher import SparkSearcher

        corpus = documents.select("text", "lang")
        first = corpus.limit(30)
        rest = corpus.subtract(first)

        inc = SparkSearcher(first, encoder=HashingEncoder(dim=8),
                            measurement="cos").train(validate=False)
        inc.add_items(rest)
        full = SparkSearcher(corpus, encoder=HashingEncoder(dim=8),
                             measurement="cos").train(validate=False)

        q = ["spark join merge"]
        a = inc.search(q, topK=5, keep_rank_no=True, score_scale=4)
        b = full.search(q, topK=5, keep_rank_no=True, score_scale=4)
        assert sorted(map(tuple, a.collect())) \
            == sorted(map(tuple, b.collect()))

    def test_add_before_train_raises(self, spark, documents):
        import pytest
        from faisssearcher_spark.encoders import HashingEncoder
        from faisssearcher_spark.searcher import SparkSearcher

        s = SparkSearcher(documents.select("text"),
                          encoder=HashingEncoder(dim=8))
        with pytest.raises(RuntimeError):
            s.add_items(documents.select("text"))
