"""Streaming embedding near-dup screen (streaming/incremental.py
embedding_screen_sink): cross-batch screening via fp16-decoded cosine,
in-batch dedup, epoch-state replay safety."""

import shutil
import time

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.streaming.incremental import embedding_screen_sink

_DIM = 16


def _vec(seed: int):
    import numpy as np
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(_DIM)
    return [float(x) for x in v / np.linalg.norm(v)]


@pytest.fixture(scope="module")
def vec_files(spark, tmp_path_factory):
    """3 parquet files → 3 micro-batches at maxFilesPerTrigger=1."""
    v0, v1, v2, v3 = _vec(0), _vec(1), _vec(2), _vec(3)
    near0 = [x if i else x * 1.001 for i, x in enumerate(v0)]
    batches = [
        [(0, v0), (1, v1)],
        [(10, near0),        # near-dup (cos ≈ 1) of committed 0
         (11, v2), (12, v2)],           # in-batch exact pair
        [(20, v0),                      # exact dup of committed 0
         (21, v3)],                     # novel survives
    ]
    path = str(tmp_path_factory.mktemp("vecs_src") / "vecs")
    for rows in batches:
        spark.createDataFrame(rows, "vec_id long, "
                                    "embedding array<double>") \
            .coalesce(1).write.mode("append").parquet(path)
        time.sleep(1.1)   # FileStreamSource orders by mtime
    return path


def _run(spark, src, base):
    stream = (spark.readStream
              .schema("vec_id long, embedding array<double>")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = embedding_screen_sink(
        stream, store_dir=str(base / "store"), out_dir=str(base / "out"),
        checkpoint_dir=str(base / "ckpt"), dim=_DIM,
        threshold=0.99, tables=8, bits=4)
    q.awaitTermination()
    return {r["vec_id"] for r in
            spark.read.parquet(str(base / "out")).collect()}


class TestEmbeddingScreenSink:
    def test_screens_history_and_within_batch(self, spark, vec_files,
                                              tmp_path_factory):
        base = tmp_path_factory.mktemp("escr")
        kept = _run(spark, vec_files, base)
        assert 0 in kept and 1 in kept          # first batch all new
        assert 10 not in kept                   # near-dup of epoch-0 vec
        assert 20 not in kept                   # exact dup of epoch-0 vec
        assert 21 in kept                       # novel survives
        assert 11 in kept and 12 not in kept    # in-batch pair: min id

    def test_replay_is_idempotent(self, spark, vec_files,
                                  tmp_path_factory):
        base = tmp_path_factory.mktemp("escr_replay")
        first = _run(spark, vec_files, base)
        shutil.rmtree(str(base / "ckpt"))
        again = _run(spark, vec_files, base)
        assert first == again

    def test_validation(self, spark):
        stream = (spark.readStream
                  .format("rate").option("rowsPerSecond", 1).load())
        with pytest.raises(ValueError, match="threshold"):
            embedding_screen_sink(
                stream, store_dir="/tmp/x", out_dir="/tmp/y",
                checkpoint_dir="/tmp/z", dim=4, threshold=1.5)
        with pytest.raises(ValueError, match=">= 1"):
            embedding_screen_sink(
                stream, store_dir="/tmp/x", out_dir="/tmp/y",
                checkpoint_dir="/tmp/z", dim=0)
