"""Attribution harness for the r12 `knn_self_similar` isolated weak.

Reproduces the bench session shape that produced the elevated readings
(BENCH_r12: iso samples [5.83, 3.73, 5.86] vs warm 1.40) and times the
leg under each candidate cause in ONE session, in order:

  baseline   — fresh warmed session, no ANN memo, no clearCache
  post_ann   — after the ANN bench legs run (memo populated, corpora
               cached), NO clearCache — isolates "memo exists" pressure
  post_clear — after spark.catalog.clearCache() with the memo still
               holding the four fitted indexes (the exact isolated-pass
               state when the leg runs at list position 3)
  post_close — after closing every memoized index via the lifecycle API
               (registry.close_bench_caches) — the verdict #2 fix
  catalyst   — same state, strategy="catalyst" control (no driver
               collect / broadcast / mapInPandas)

Each phase takes AB_RUNS samples (default 3). If post_clear is elevated
and post_close is not, the memo re-cache is the cause and bench-pass
teardown is the fix; if ALL phases read flat, the r12 elevation was
session interference the harness can't reproduce, which is itself an
attribution (record it).
"""
from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(repo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "3"))

    from faisssearcher_spark import registry
    from faisssearcher_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("ab_selfsim")
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py's one-time warmups (codegen JIT, Arrow collect, Python
    # worker pool, MLlib classloading)
    warm = spark.range(100_000).select(
        F.col("id"), F.transform(F.sequence(F.lit(1), F.lit(8)),
                                 lambda i: i * F.col("id")).alias("v"))
    warm.select(F.sum(F.aggregate("v", F.lit(0).cast("long"),
                                  lambda a, x: a + x))).collect()
    warm.limit(1000).toPandas()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _wu(s):
        return s * 1.0

    spark.range(100_000).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .select(_wu(F.col("id").cast("double"))).write \
        .mode("overwrite").format("noop").save()
    from pyspark.ml.clustering import KMeans as _WKM
    from pyspark.ml.functions import array_to_vector as _wav
    _wkf = spark.range(2).select(
        _wav(F.array(F.col("id").cast("double"))).alias("features"))
    _WKM(k=2, maxIter=1).fit(_wkf)

    def _time_leg(name: str) -> float:
        t0 = time.time()
        registry.ALL_QUERY_FNS[name](spark, sf_dir) \
            .write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    def _samples(name: str) -> list[float]:
        return [_time_leg(name) for _ in range(runs)]

    out: dict = {"runs": runs, "sf_dir": sf_dir}

    out["baseline"] = _samples("knn_self_similar")

    ann_legs = ["ann_pq_topk", "ann_b1_topk", "ann_ivfpq_topk",
                "ann_opq_topk", "ann_sq_topk"]
    for leg in ann_legs:
        _time_leg(leg)
    out["post_ann"] = _samples("knn_self_similar")

    spark.catalog.clearCache()
    out["post_clear"] = _samples("knn_self_similar")

    close = getattr(registry, "close_bench_caches", None)
    if close is not None:
        close(spark)
        spark.catalog.clearCache()
        out["post_close"] = _samples("knn_self_similar")
    else:
        out["post_close"] = "close_bench_caches not implemented yet"

    # control: same query shape without the blocked kernel's driver
    # collect / sc.broadcast / mapInPandas
    from faisssearcher_spark.operators.knn import knn_join
    from faisssearcher_spark.registry import load_table

    def _catalyst_once() -> float:
        emb = load_table(spark, sf_dir, "embeddings")
        q = emb.select(F.col("vec_id").alias("qid"), "embedding")
        t0 = time.time()
        knn_join(q, emb, metric="cos", k=3, query_item_col="qid",
                 item_key_col="vec_id", payload_cols=[], score_scale=4,
                 strategy="catalyst") \
            .write.mode("overwrite").format("noop").save()
        return round(time.time() - t0, 3)

    out["catalyst_control"] = [_catalyst_once() for _ in range(runs)]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
