"""One-off probe: where does q_ann_opq_topk's per-repeat growth come
from? Splits fit (driver OPQ training + encode plan) vs search
(distributed ADC), repeats N times, optionally unpersisting the index
between repeats (AB_UNPERSIST=1) — if growth vanishes with unpersist,
the leak is cache accumulation, not the operator."""
from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(repo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "5"))
    unp = os.environ.get("AB_UNPERSIST", "0") == "1"
    from faisssearcher_spark.operators import ann
    from faisssearcher_spark.session import get_spark
    from faisssearcher_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    spark = get_spark("ab_opq_probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), "embedding")
    emb.count()

    out = {"unpersist": unp, "fit": [], "train": [], "search": []}
    for _ in range(runs):
        t0 = time.time()
        pq = ann.PQIndex(m=16, metric="cos", seed=42, opq=True,
                         opq_iters=6)
        import numpy as np
        pdf = emb.select(F.col("vec_id").alias("k"), F.col("embedding")
                         .alias("v")).orderBy("k") \
            .limit(pq.train_sample).toPandas()
        mat = np.stack(pdf["v"].to_numpy()).astype("float32")
        t1 = time.time()
        _ = ann._train_opq_rotation(mat, pq.m, pq.ksub, pq.train_iters,
                                    pq.seed, pq.opq_iters)
        t2 = time.time()
        out["train"].append(round(t2 - t1, 3))
        pq = ann.PQIndex(m=16, metric="cos", seed=42, opq=True,
                         opq_iters=6).fit(emb, item_key_col="vec_id",
                                          item_vec_col="embedding")
        t3 = time.time()
        out["fit"].append(round(t3 - t2, 3))
        res = pq.search(q, k=10, query_item_col="qid",
                        payload_cols=["label"])
        res.write.mode("overwrite").format("noop").save()
        out["search"].append(round(time.time() - t3, 3))
        if unp:
            pq._items.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
