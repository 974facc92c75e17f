"""Dump .explain('formatted') for the round-14-touched queries into
plans/r14/<query>_{before,after}.txt.

'after' comes from the current repo; 'before' from a worktree of the
round's baseline commit (2a5b656 — the round-13 close), selected via
$PLANS_CODE_ROOT:

    python tools/dump_r14_plans.py after
    PLANS_CODE_ROOT=/tmp/r14_base python tools/dump_r14_plans.py before

Store-arc legs whose work is EAGER driver composition (the returned
frame is a local-rows frame) get the note header plus the plan of the
composed screen frame where that is meaningful.
"""
from __future__ import annotations

import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# explicit code-root selection — keying off PYTHONPATH emptiness would
# silently dump from whatever an unrelated pre-existing PYTHONPATH
# resolves (review catch); the engine path is also stamped per header
sys.path.insert(0, os.environ.get("PLANS_CODE_ROOT", repo))

QUERIES = [
    "text_fingerprints", "pipeline_pretrain_prep", "curate_documents",
    "dedup_estore_screen", "dedup_fpstore_screen", "dedup_upsert_screen",
    "searcher_text_knn", "text_cms_stream", "text_quality_scores",
    "text_token_stats", "sample_dsir",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(repo, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    from faisssearcher_spark import registry
    from faisssearcher_spark.session import get_spark

    spark = get_spark("dump_r14_plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in QUERIES:
        fn = registry.ALL_QUERY_FNS[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as exc:  # keep going; record the failure
            plan = f"<failed to build: {exc!r}>"
        hdr = (f"== {name} ({tag}) — explain('formatted') at "
               f"{sf_dir}, engine code: "
               f"{os.path.dirname(registry.__file__)} ==\n")
        if name.endswith("_screen"):
            hdr += ("NOTE: store-arc leg — the operator work (commit/"
                    "upsert/compact/screen) runs EAGERLY during query "
                    "build; the returned frame is the materialized hit "
                    "rows, so this plan shows only the final local "
                    "frame. The arc's plan-relevant claims are in the "
                    "operator sources (operators/incremental.py).\n")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(hdr + "\n" + plan + "\n")
        print("wrote", name, tag, flush=True)


if __name__ == "__main__":
    main()
