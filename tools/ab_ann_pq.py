"""A/B the ann_pq scale-sweep leg (r7 verdict #4): its x10 time ratio
measured 5.8 in the r7 sweep vs 2.98 in r6 — attribute the delta to
machine drift or to a code change before round 8 touches the PQ path.

Runs ONLY the ann_pq leg (x1 and x10 corpora from $SPARK_GRAFT_SF_DIR)
against whatever faisssearcher_spark is first on sys.path — point
PYTHONPATH at a checkout to A/B across commits:

    python tools/ab_ann_pq.py            # current repo
    PYTHONPATH=/tmp/r6repo python tools/ab_ann_pq.py   # r6 code

Prints one JSON line {"sec_x1": s, "sec_x10": s, "ratio": r, ...}.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

# PYTHONPATH (if set) must win over the repo dir so the A/B actually
# exercises the old commit; fall back to this repo otherwise.
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(repo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "2"))
    import faisssearcher_spark
    from faisssearcher_spark import scalebench
    from faisssearcher_spark.operators import ann
    from faisssearcher_spark.session import get_spark
    from faisssearcher_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    spark = get_spark("ab_ann_pq")
    spark.sparkContext.setLogLevel("ERROR")
    emb_base = load_table(spark, sf_dir, "embeddings")
    n_emb = emb_base.count()
    stride = max(1, n_emb // 20)
    queries = emb_base.filter(F.col("vec_id") % stride == 0) \
        .select("vec_id", "embedding")

    out = {"code": os.path.dirname(faisssearcher_spark.__file__)}
    tmp = tempfile.mkdtemp(prefix="ab_pq_")
    n_part = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for f in (1, 10):
        path = f"{tmp}/emb_x{f}"
        scalebench.scaled_embeddings(emb_base, f).write.parquet(path)
        emb = spark.read.parquet(path).repartition(n_part)
        emb.count()

        def thunk():
            return ann.PQIndex(m=8, metric="cos", seed=42).fit(
                emb, item_key_col="vec_id", item_vec_col="embedding"
            ).search(queries, k=5, query_item_col="vec_id")

        best = float("inf")
        for _ in range(runs):
            t0 = time.time()
            thunk().write.mode("overwrite").format("noop").save()
            best = min(best, time.time() - t0)
        out[f"sec_x{f}"] = round(best, 3)
    out["ratio"] = round(out["sec_x10"] / out["sec_x1"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
