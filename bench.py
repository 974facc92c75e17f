"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. Each query is fully materialized
through the noop sink (forces execution of the whole plan, no driver
collect overhead).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # reference-parity vector surface
    "knn_cosine_top5",
    "knn_l2_top5",
    "cal_sim_dot",
    "pairwise_metrics",
    "searcher_text_knn",
    # ANN
    "ann_lsh_bucket_top3",
    # dedup
    "dedup_exact_keyed",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_fingerprint",
    "dedup_embedding_cosine",
    "dedup_clusters",
    # text
    "text_token_stats",
    "text_quality_scores",
    "text_fingerprints",
    "text_ngram_topk",
    # relational / events
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "tpch_q6_revenue",
    "tpch_q18_big_orders",
    "lineitem_rollup",
    "top_customers_per_nation",
    "events_hourly_rollup",
    "events_sessionize",
    "events_asof_join",
    "events_range_join",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from faisssearcher_spark.session import get_spark
    from faisssearcher_spark import registry

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = registry.QUERIES[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
