"""Whitening: covariance-identity property, numpy parity, persistence,
guard rails (SURVEY.md §5.3; reference vecs_whitening.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.whitening import VecsWhitening


@pytest.fixture(scope="module")
def gauss_df(spark):
    rng = np.random.default_rng(3)
    # anisotropic gaussian so whitening has something to do
    mat = rng.standard_normal((200, 8)) @ np.diag([5, 3, 2, 1, 1, 0.5, 0.2, 0.1])
    rows = [([float(x) for x in row],) for row in mat]
    return spark.createDataFrame(rows, "embedding array<double>"), mat


class TestFit:
    def test_moments_match_numpy(self, spark, gauss_df):
        df, mat = gauss_df
        model = VecsWhitening(8).fit(df, "embedding")
        mu = mat.mean(axis=0)
        cov = np.cov(mat.T)
        u, s, _ = np.linalg.svd(cov)
        kernel = (u @ np.diag(1 / np.sqrt(s)))[:, :8]
        assert model.bias == pytest.approx(-mu, rel=1e-9)
        # SVD sign ambiguity: compare |kernel|
        assert np.abs(model.kernel) == pytest.approx(np.abs(kernel), rel=1e-6)

    def test_transform_whitens_covariance(self, spark, gauss_df):
        df, _ = gauss_df
        model = VecsWhitening(4).fit(df, "embedding")
        out = model.transform(df, "embedding").toPandas()
        w = np.array(out["embedding"].to_list())
        assert w.shape[1] == 4
        cov = np.cov(w.T)
        assert cov == pytest.approx(np.eye(4), abs=1e-6)

    def test_ncomponents_too_large_raises(self, spark, gauss_df):
        df, _ = gauss_df
        with pytest.raises(ValueError, match="n_components"):
            VecsWhitening(9).fit(df, "embedding")

    def test_transform_before_fit_raises(self, spark, gauss_df):
        df, _ = gauss_df
        with pytest.raises(RuntimeError, match="fit"):
            VecsWhitening(4).transform(df, "embedding")

    def test_dim_mismatch_raises(self, spark, gauss_df):
        df, _ = gauss_df
        model = VecsWhitening(2).fit(df, "embedding")
        bad = spark.createDataFrame([([1.0, 2.0],)], "embedding array<double>")
        with pytest.raises(Exception, match="dim"):
            model.transform(bad, "embedding").collect()


class TestPersistence:
    def test_save_load_roundtrip(self, spark, gauss_df, tmp_path):
        df, _ = gauss_df
        model = VecsWhitening(4).fit(df, "embedding")
        path = str(tmp_path / "bw_model")
        model.save(spark, path)
        loaded = VecsWhitening.load(spark, path)
        assert loaded.n_components == 4
        assert loaded.origin_dim == 8
        assert loaded.kernel == pytest.approx(model.kernel)
        assert loaded.bias == pytest.approx(model.bias)
        # n_components check mirrors vecs_whitening.py:72-73
        with pytest.raises(ValueError, match="n_components"):
            loaded.expect_components(8)
