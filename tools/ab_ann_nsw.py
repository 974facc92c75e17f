"""A/B the ann_nsw scale-sweep leg (r8 verdict #2): its x10->x100 time
ratio measured 13.4 in the r8 sweep vs 7.34 in r7, with the x10 point
(0.551 s) anomalously BELOW the x1 point (0.891 s) -- the exact drift
signature r7's ann_pq 5.8 turned out to be.

Code-change elimination first: ``git diff 385908c HEAD --
faisssearcher_spark/operators/graph.py`` is EMPTY (graph.py untouched
since r7-final), and the sweep's nsw thunk is unchanged, so a cross-
commit worktree A/B is a no-op by construction.  What remains is drift
attribution: run the identical leg at x1/x10/x100 with real repeats
(the sweep runs the deep point ONCE) on a quiet machine.

    python tools/ab_ann_nsw.py            # AB_RUNS=3 repeats per point

Prints one JSON line {"sec_x1": [..], "sec_x10": [..], "sec_x100":
[..], "ratio_10_100": r, ...} with per-repeat times so the spread is
visible, not just the min.
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(repo)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "3"))
    import faisssearcher_spark
    from faisssearcher_spark import scalebench
    from faisssearcher_spark.operators.graph import nsw_topk
    from faisssearcher_spark.session import get_spark
    from faisssearcher_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    spark = get_spark("ab_ann_nsw")
    spark.sparkContext.setLogLevel("ERROR")
    emb_base = load_table(spark, sf_dir, "embeddings")
    n_emb = emb_base.count()
    stride = max(1, n_emb // 20)
    queries = emb_base.filter(F.col("vec_id") % stride == 0) \
        .select("vec_id", "embedding")

    out: dict = {"code": os.path.dirname(faisssearcher_spark.__file__),
                 "runs": runs}
    tmp = tempfile.mkdtemp(prefix="ab_nsw_")
    n_part = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for f in (1, 10, 100):
        path = f"{tmp}/emb_x{f}"
        scalebench.scaled_embeddings(emb_base, f).write.parquet(path)
        emb = spark.read.parquet(path).repartition(n_part)
        emb.count()

        def thunk():
            return nsw_topk(queries, emb, k=5, m=8, ef_construction=32,
                            ef_search=48, n_shards=n_part,
                            query_item_col="vec_id",
                            item_key_col="vec_id")

        secs = []
        for _ in range(runs):
            t0 = time.time()
            thunk().write.mode("overwrite").format("noop").save()
            secs.append(round(time.time() - t0, 3))
        out[f"sec_x{f}"] = secs
    mn = {f: min(out[f"sec_x{f}"]) for f in (1, 10, 100)}
    out["ratio_1_10"] = round(mn[10] / mn[1], 2)
    out["ratio_10_100"] = round(mn[100] / mn[10], 2)
    out["ratio_1_100"] = round(mn[100] / mn[1], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
