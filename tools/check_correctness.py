"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry through Spark and its ``oracle_sql()`` twin
through DuckDB on the same parquet tables, then compares row count, sorted
column names, and order-insensitive values (stringified, rows sorted).

Usage:
    python tools/check_correctness.py [--sf DIR] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df, float_round=None):
    """Canonicalize a pandas frame: sort columns by name, stringify, sort rows."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()

    def cell(v):
        if isinstance(v, float):
            # driver-style tolerance: queries already round; this only
            # normalizes -0.0 and float formatting
            if v == 0:
                v = 0.0
            return repr(round(v, 9))
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        try:
            import numpy as np
            if isinstance(v, np.ndarray):
                return "[" + ",".join(cell(x) for x in v.tolist()) + "]"
            if isinstance(v, (np.integer,)):
                return repr(int(v))
            if isinstance(v, (np.floating,)):
                return cell(float(v))
        except ImportError:
            pass
        return repr(v)

    rows = ["\x1f".join(cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from faisssearcher_spark.session import get_spark

    spark = get_spark("check_correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or list(qs)
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if not len(sdf):
                print(f"WARN  {name}: zero rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {e}")
            failures.append(name)
            continue
        ok = True
        msgs = []
        if len(sdf) != len(odf):
            ok = False
            msgs.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            ok = False
            msgs.append(f"columns spark={sorted(sdf.columns)} "
                        f"oracle={sorted(odf.columns)}")
        if ok:
            s_rows, o_rows = canon(sdf), canon(odf)
            if s_rows != o_rows:
                ok = False
                diff = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
                msgs.append(f"{len(diff)} mismatched rows; first: "
                            f"spark={diff[0][0][:200]!r} oracle={diff[0][1][:200]!r}"
                            if diff else "length mismatch after canon")
        status = "ok   " if ok else "FAIL "
        print(f"{status} {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]"
              + ("" if ok else " :: " + "; ".join(msgs)))
        if not ok:
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
