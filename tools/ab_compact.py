"""One-off probe for the bounded-compact cost contract: build a
MinHashStore with N equal epochs, tombstone ONE epoch's ids, and time
compact() (bounded, manifest-pruned) vs compact(full=True) on
identical twin stores. Bounded cost should track the touched epoch +
hardlinks, full cost the whole state.

    AB_EPOCHS=8 AB_ROWS=400 python tools/ab_compact.py
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
    n_epochs = int(os.environ.get("AB_EPOCHS", "8"))
    rows_per = int(os.environ.get("AB_ROWS", "400"))
    from faisssearcher_spark.operators.incremental import MinHashStore
    from faisssearcher_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("ab_compact")
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(base):
        return spark.range(base, base + rows_per).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("alpha beta gamma delta epsilon zeta token "),
                     F.col("id").cast("string"),
                     F.lit(" eta theta iota kappa")).alias("text"))

    out: dict = {"epochs": n_epochs, "rows_per_epoch": rows_per}
    stores = {}
    for mode in ("bounded", "full"):
        root = tempfile.mkdtemp(prefix=f"ab_compact_{mode}_")
        st = MinHashStore(spark, root, layout="epoch")
        for e in range(n_epochs):
            st.commit(corpus(e * rows_per))
        # one correction confined to the FIRST epoch's id range
        st.upsert(corpus(0).limit(50))
        stores[mode] = st
    for mode, st in stores.items():
        t0 = time.time()
        st.compact(full=(mode == "full"))
        out[f"compact_{mode}_sec"] = round(time.time() - t0, 3)
        out[f"state_rows_{mode}"] = st.state().count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
