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

    def test_range_search_contains_self_and_matches_topk(self,
                                                         doc_searcher,
                                                         documents):
        """range_search(r) must return exactly the items search() scores
        above r — checked against a full-corpus search at the same
        rounding — and the self-match (sim 1.0) always clears r<1."""
        text = documents.first()["text"]
        n = documents.count()
        rs = doc_searcher.range_search([text], radius=0.8, score_scale=4)
        assert rs.columns == ["source_item", "sim_item", "sim_val",
                              "lang", "source", "n_chars"]
        got = {r["sim_item"] for r in rs.collect()}
        assert text in got
        full = doc_searcher.search([text], topK=n, score_scale=4).collect()
        want = {r["sim_item"] for r in full if r["sim_val"] > 0.8}
        assert got == want

    def test_multi_radius_dict(self, doc_searcher, documents):
        """range_search(radii=[...]) — the List-K compute-once/filter-
        many form: dict keyed by radius, each frame equal to the
        standalone call at that radius."""
        text = documents.first()["text"]
        multi = doc_searcher.range_search([text], [0.9, 0.7],
                                          score_scale=4)
        assert sorted(multi) == [0.7, 0.9]
        for r, df in multi.items():
            want = {(x["source_item"], x["sim_item"], x["sim_val"])
                    for x in doc_searcher.range_search(
                        [text], r, score_scale=4).collect()}
            got = {(x["source_item"], x["sim_item"], x["sim_val"])
                   for x in df.collect()}
            assert got == want, f"radius {r}"
        # the tighter set is a subset of the looser one
        loose = {x["sim_item"] for x in multi[0.7].collect()}
        tight = {x["sim_item"] for x in multi[0.9].collect()}
        assert tight <= loose and text in tight

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

    def test_whitened_roundtrip_scores_unchanged(self, spark, embeddings,
                                                 tmp_path):
        """r1/r2 ADVICE: a whitened searcher must reload WITH its whitening
        (has_whitening now lives in the JSON meta, not an os.path probe) —
        scores after load must equal scores before."""
        from faisssearcher_spark.operators.whitening import VecsWhitening

        wh = VecsWhitening(8).fit(embeddings, "embedding")
        s = SparkSearcher(embeddings, vec_col="embedding", key_col="vec_id",
                          measurement="cos", whitening=wh).train()
        q = embeddings.limit(3)
        before = sorted(map(tuple,
                            s.search(q, topK=4, keep_rank_no=True,
                                     score_scale=4).collect()))
        path = str(tmp_path / "searcher_wh")
        s.save(path)
        loaded = SparkSearcher.load(spark, path)
        assert loaded.whitening is not None
        after = sorted(map(tuple,
                           loaded.search(q, topK=4, keep_rank_no=True,
                                         score_scale=4).collect()))
        assert before == after

    def test_meta_records_has_whitening(self, spark, embeddings, tmp_path):
        import json
        import os
        s = SparkSearcher(embeddings, vec_col="embedding", key_col="vec_id",
                          measurement="cos").train()
        path = str(tmp_path / "searcher_plain")
        s.save(path)
        meta = json.loads(spark.read.parquet(
            os.path.join(path, "meta")).first()["meta"])
        assert meta["has_whitening"] is False


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

    def test_add_items_unpersists_superseded_corpus(self, spark, documents):
        """r1/r2 ADVICE: repeated appends must not pin every intermediate
        corpus in executor storage."""
        corpus = documents.select("text", "lang")
        s = SparkSearcher(corpus.limit(20), encoder=HashingEncoder(dim=8),
                          measurement="cos").train(validate=False)
        old = s.corpus
        assert old.storageLevel.useMemory
        s.add_items(corpus.limit(30).subtract(corpus.limit(20)))
        assert not old.storageLevel.useMemory  # superseded cache released
        assert s.corpus.storageLevel.useMemory


class TestCombinedKwargs:
    def test_multik_with_payload_and_both_feature_seps(self, spark):
        """VERDICT r2 #7: the List-K dict path must compose with payload
        carry AND both feature-sep splits — each multi-K slice equals the
        direct single-K search with identical kwargs."""
        corpus = spark.createDataFrame(
            [("apple pie recipe##d1", "food", 1),
             ("apple tart recipe##d2", "food", 2),
             ("banana bread##d3", "food", 3),
             ("spark shuffle join##d4", "eng", 4),
             ("spark merge join##d5", "eng", 5)],
            "text string, topic string, pid int")
        def build():
            return SparkSearcher(
                corpus, encoder=HashingEncoder(dim=8), measurement="cos",
                query_feature_sep="##", doc_feature_sep="##").train()
        s = build()
        multi = s.search(["apple pie recipe##q1", "spark join##q2"],
                         topK=[1, 3], keep_rank_no=True, score_scale=4)
        assert sorted(multi) == [1, 3]
        for k in (1, 3):
            direct = build().search(
                ["apple pie recipe##q1", "spark join##q2"],
                topK=k, keep_rank_no=True, score_scale=4)
            got = sorted(map(tuple, multi[k].collect()))
            want = sorted(map(tuple, direct.collect()))
            assert got == want, k
            # the separator split really happened on both sides
            for r in multi[k].collect():
                assert "##" not in r["source_item"]
                assert "##" not in r["sim_item"]
            # payload carried
            assert multi[k].columns[-2:] == ["topic", "pid"]


class TestAutoStrategyThroughSearcher:
    def test_search_with_auto_strategy(self, doc_searcher):
        """strategy='auto' flows through the facade: encoded query frames
        have no usable size estimate (Python UDF stage), so auto must
        still resolve to a working kernel and match the default path."""
        a = doc_searcher.search(["spark join merge"], topK=3,
                                keep_rank_no=True, score_scale=4)
        b = doc_searcher.search(["spark join merge"], topK=3,
                                keep_rank_no=True, score_scale=4,
                                strategy="auto")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestIndexParam:
    """Reference parity: FaissSearcher(index_param=...) forwards FAISS
    index_factory specs (faiss_searcher.py:30,104). IVF / PQ / IVFPQ map
    to the native Spark indexes; when an index_param is given EVERY
    search routes through it; multi-K slices one max-K search."""

    def test_ivf_exhaustive_probe_matches_exact(self, embeddings):
        base = SparkSearcher(embeddings, vec_col="embedding",
                             key_col="vec_id", measurement="cos").train()
        ivf = SparkSearcher(embeddings, vec_col="embedding",
                            key_col="vec_id", measurement="cos",
                            index_param="IVF8",
                            index_kwargs={"nprobe": 8}).train()
        q = embeddings.limit(3)
        exact = {(r["source_item"], r["sim_item"])
                 for r in base.search(q, topK=5).collect()}
        idx = {(r["source_item"], r["sim_item"])
               for r in ivf.search(q, topK=5).collect()}
        assert idx == exact   # nprobe == n_cells -> exhaustive == exact

    def test_pq_encoder_mode_and_multik(self, documents):
        corpus = documents.select("text", "lang", "source", "n_chars")
        s = SparkSearcher(corpus, encoder=HashingEncoder(dim=8),
                          measurement="cos", index_param="PQ4").train()
        text = documents.first()["text"]
        multi = s.search([text], topK=[1, 3], keep_rank_no=True)
        assert set(multi) == {1, 3}
        assert multi[1].count() == 1 and multi[3].count() == 3
        rows3 = multi[3].collect()
        # PQ4 over 8 hashed dims is deliberately coarse: docs whose
        # embeddings collide in code space tie at the top, so the self
        # text is only guaranteed within the top-3, not exact top-1
        assert text in {r["sim_item"] for r in rows3}
        assert all(r["lang"] is not None for r in rows3)   # payload carried
        # multi-K slice == direct search at that K
        direct = {(r["source_item"], r["sim_item"])
                  for r in s.search([text], topK=3).collect()}
        sliced = {(r["source_item"], r["sim_item"])
                  for r in multi[3].collect()}
        assert sliced == direct

    def test_ivfpq_roundtrip_rebuilds_index(self, spark, embeddings,
                                            tmp_path):
        s = SparkSearcher(embeddings, vec_col="embedding",
                          key_col="vec_id", measurement="cos",
                          index_param="IVF8,PQ8",
                          index_kwargs={"nprobe": 8}).train()
        q = embeddings.limit(2)
        before = {(r["source_item"], r["sim_item"])
                  for r in s.search(q, topK=4).collect()}
        path = str(tmp_path / "searcher_ivfpq")
        s.save(path)
        loaded = SparkSearcher.load(spark, path)
        assert loaded.index_param == "IVF8,PQ8"
        after = {(r["source_item"], r["sim_item"])
                 for r in loaded.search(q, topK=4).collect()}
        assert after == before   # seeded quantizers rebuild identically

    def test_add_items_reaches_index(self, embeddings):
        base = embeddings.filter(F.col("vec_id") < 400)
        extra = embeddings.filter(F.col("vec_id") >= 400)
        s = SparkSearcher(base, vec_col="embedding", key_col="vec_id",
                          measurement="cos", index_param="IVF8",
                          index_kwargs={"nprobe": 8}).train()
        s.add_items(extra)
        probe = extra.limit(1)
        top = s.search(probe, topK=1).collect()[0]
        assert top["sim_item"] == top["source_item"]   # added row findable
        assert top["sim_val"] == pytest.approx(1.0, abs=1e-6)

    def test_hnsw_spec_builds_native_graph(self, embeddings):
        """Round 6: bare HNSW<m> maps to the native NSW graph index
        (operators/graph.py) — no faiss import needed, same convention
        as IVF/PQ specs building native structures."""
        s = SparkSearcher(embeddings, vec_col="embedding",
                          key_col="vec_id", measurement="cos",
                          index_param="HNSW12").train()
        from faisssearcher_spark.operators.graph import NSWIndex
        assert isinstance(s._index, NSWIndex)
        q = embeddings.limit(1)
        top = s.search(q, topK=3, keep_rank_no=True)
        rows = top.collect()
        assert len(rows) == 3
        r0 = [r for r in rows if r["rank_no"] == 0][0]
        assert r0["sim_item"] == r0["source_item"]   # self at rank 0

    def test_unknown_spec_defers_to_faiss(self, embeddings):
        s = SparkSearcher(embeddings, vec_col="embedding",
                          key_col="vec_id", measurement="cos",
                          index_param="NSG32").train()
        try:
            import faiss  # noqa: F401
        except ImportError:
            with pytest.raises(ImportError):
                s.search(embeddings.limit(1), topK=3)
        else:
            assert s.search(embeddings.limit(1), topK=3).count() == 3

    def test_unsupported_measurement_rejected(self, embeddings):
        with pytest.raises(ValueError):
            SparkSearcher(embeddings, vec_col="embedding",
                          key_col="vec_id", measurement="canberra",
                          index_param="IVF8")


class TestRefineSpec:
    """",RFlat" index_factory suffix (IndexRefineFlat): native exact
    re-score for the PQ family through the facade."""

    def _corpus(self, spark):
        from faisssearcher_spark.sources.catalog import load_table
        return load_table(spark, "/root/testdata/sf0.001", "embeddings") \
            .limit(120).select("vec_id", "embedding", "label")

    def test_pq_rflat_matches_exact_search(self, spark):
        from faisssearcher_spark.searcher import SparkSearcher
        corpus = self._corpus(spark)
        q = corpus.limit(6)
        exact = SparkSearcher(corpus, vec_col="embedding", key_col="vec_id",
                              measurement="cos").train() \
            .search(q, topK=4, keep_rank_no=True)
        # shortlist factor large enough to cover the whole corpus ->
        # refined results must EQUAL the exact search
        refined = SparkSearcher(corpus, vec_col="embedding",
                                key_col="vec_id", measurement="cos",
                                index_param="PQ8,RFlat",
                                index_kwargs={"refine_factor": 40}) \
            .train().search(q, topK=4, keep_rank_no=True)
        e = {(r["source_item"], r["rank_no"]): r["sim_item"]
             for r in exact.collect()}
        g = {(r["source_item"], r["rank_no"]): r["sim_item"]
             for r in refined.collect()}
        assert e == g

    def test_spec_routing(self, spark):
        from faisssearcher_spark.searcher import SparkSearcher
        corpus = self._corpus(spark)
        s = SparkSearcher(corpus, vec_col="embedding", key_col="vec_id",
                          index_param="IVF8,PQ8,RFlat")
        assert s._index_plan[0] == "ivfpq" and s._refine
        s2 = SparkSearcher(corpus, vec_col="embedding", key_col="vec_id",
                           index_param="IVF8,RFlat")
        assert s2._index_plan[0] == "ivf" and not s2._refine  # already exact
        s3 = SparkSearcher(corpus, vec_col="embedding", key_col="vec_id",
                           index_param="SQ8,RFlat")
        assert s3._index_plan[0] == "faiss"   # real-FAISS pass-through


class TestRefineReviewRegressions:
    def test_refine_factor_survives_save_load(self, spark,
                                              tmp_path_factory):
        from faisssearcher_spark.searcher import SparkSearcher
        from faisssearcher_spark.sources.catalog import load_table
        corpus = load_table(spark, "/root/testdata/sf0.001",
                            "embeddings").limit(80) \
            .select("vec_id", "embedding")
        s = SparkSearcher(corpus, vec_col="embedding", key_col="vec_id",
                          measurement="cos", index_param="PQ8,RFlat",
                          index_kwargs={"refine_factor": 30}).train()
        path = str(tmp_path_factory.mktemp("rfs") / "s")
        s.save(path)
        loaded = SparkSearcher.load(spark, path)
        assert loaded.refine_factor == 30
        assert loaded._refine

    def test_refine_factor_without_rflat_rejected(self, spark):
        from faisssearcher_spark.searcher import SparkSearcher
        from faisssearcher_spark.sources.catalog import load_table
        corpus = load_table(spark, "/root/testdata/sf0.001",
                            "embeddings").limit(10) \
            .select("vec_id", "embedding")
        with pytest.raises(ValueError, match="RFlat"):
            SparkSearcher(corpus, vec_col="embedding", key_col="vec_id",
                          index_param="PQ8",
                          index_kwargs={"refine_factor": 4})

    def test_refine_factor_one_still_rescores_exactly(self, spark):
        """FAISS k_factor=1 semantics: the top-k itself is re-ranked
        with exact scores (review finding: factor 1 silently skipped
        the re-score)."""
        from faisssearcher_spark.functions.metrics import cosine
        from faisssearcher_spark.operators.ann import PQIndex
        from faisssearcher_spark.sources.catalog import load_table
        corpus = load_table(spark, "/root/testdata/sf0.001",
                            "embeddings").limit(100)
        q = corpus.limit(4).select(F.col("vec_id").alias("query_id"),
                                   "embedding")
        idx = PQIndex(m=8, metric="cos").fit(
            corpus, item_key_col="vec_id", item_vec_col="embedding")
        out = idx.search(q, k=3, query_item_col="query_id",
                         refine_factor=1).collect()
        vecs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
        import numpy as np
        for r in out:
            a = np.array(vecs[r["source_item"]], dtype=np.float64)
            b = np.array(vecs[r["sim_item"]], dtype=np.float64)
            exact = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert r["sim_val"] == pytest.approx(exact, abs=1e-9)
