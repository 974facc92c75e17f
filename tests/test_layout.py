"""Z-order layout (operators/layout.py) — multi-column min-max pruning.

Semantics pinned here: the z-key interleaves quantile-rank bits (verified
against a Python Morton reference on uniform data); writing the layout
shrinks EVERY participating column's per-file min-max span (measured from
real parquet footers, vs both natural and single-column-sorted layouts);
NULLs bucket low; validation rejects strings, oversized bits, and column
collisions.
"""

import glob

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.layout import zorder_key, zorder_layout


@pytest.fixture(scope="module")
def grid_df(spark):
    """10k rows with two independent uniform columns — the worst case for
    single-column sort, the textbook case for Z-order."""
    import random

    rng = random.Random(42)
    rows = [(i, float(rng.randrange(100)), float(rng.randrange(100)))
            for i in range(10_000)]
    return spark.createDataFrame(rows, "row_id long, x double, y double") \
        .cache()


def _py_morton(bx, by, bits):
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i)
        z |= ((by >> i) & 1) << (2 * i + 1)
    return z


def test_zkey_matches_python_morton_on_uniform_grid(spark, grid_df):
    """On uniform integers 0..99 with 4 bits, quantile buckets are value
    buckets (floor(v/100*16)), so the key equals a direct Morton code."""
    got = zorder_key(grid_df, ["x", "y"], bits=4).collect()
    for r in got:
        bx = min(15, int(r["x"] * 16 / 100))
        by = min(15, int(r["y"] * 16 / 100))
        want = _py_morton(bx, by, 4)
        # quantile boundaries are approximate (GK sketch): allow the
        # bucket to be off by one step per column, never more
        gz = r["__zorder"]
        ok = any(_py_morton(bxx, byy, 4) == gz
                 for bxx in (max(0, bx - 1), bx, min(15, bx + 1))
                 for byy in (max(0, by - 1), by, min(15, by + 1)))
        assert ok, (r["x"], r["y"], gz, want)


def _file_spans(path, cols):
    """Per-file (max-min) span of each column from real parquet footers."""
    import pyarrow.parquet as pq

    spans = {c: [] for c in cols}
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = st.min if lo[name] is None \
                        else min(lo[name], st.min)
                    hi[name] = st.max if hi[name] is None \
                        else max(hi[name], st.max)
        for c in cols:
            if lo[c] is not None:
                spans[c].append(hi[c] - lo[c])
    return spans


def test_layout_shrinks_every_columns_file_spans(spark, grid_df, tmp_path):
    natural = str(tmp_path / "natural")
    bysort = str(tmp_path / "xsorted")
    zordered = str(tmp_path / "zordered")
    grid_df.repartition(16).write.parquet(natural)
    grid_df.repartitionByRange(16, "x").sortWithinPartitions("x") \
        .write.parquet(bysort)
    zorder_layout(grid_df, ["x", "y"], n_files=16, bits=6) \
        .write.parquet(zordered)

    nat = _file_spans(natural, ["x", "y"])
    srt = _file_spans(bysort, ["x", "y"])
    zo = _file_spans(zordered, ["x", "y"])

    def mean(v):
        return sum(v) / len(v)

    # natural layout: every file spans ~the full 0..99 range in both cols
    assert mean(nat["x"]) > 90 and mean(nat["y"]) > 90
    # x-sort: x tight, y still full-range — the single-column failure mode
    assert mean(srt["x"]) < 15 and mean(srt["y"]) > 90
    # z-order: BOTH columns tight: 16 files over a 2-d curve ⇒ each file
    # covers ~1/4 of each dimension
    assert mean(zo["x"]) < 50 and mean(zo["y"]) < 50
    assert mean(zo["x"]) < 0.6 * mean(nat["x"])
    assert mean(zo["y"]) < 0.6 * mean(nat["y"])


def test_layout_preserves_rows_and_drops_helper(spark, grid_df):
    out = zorder_layout(grid_df, ["x", "y"], n_files=8, bits=4)
    assert out.columns == grid_df.columns
    assert out.count() == grid_df.count()
    assert out.rdd.getNumPartitions() == 8


def test_nulls_bucket_low(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 0.0, 5.0), (3, 99.0, 5.0)],
        "id long, x double, y double")
    rows = {r["id"]: r["__zorder"]
            for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    assert rows[1] <= rows[2] <= rows[3]


def test_validation_errors(spark, grid_df):
    docs = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError, match="ordered numeric"):
        zorder_key(docs, ["text"])
    with pytest.raises(ValueError, match="fit a long"):
        zorder_key(grid_df, ["x", "y"], bits=32)
    with pytest.raises(ValueError, match="expression tree"):
        zorder_key(grid_df, ["x"], bits=13)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(grid_df, [])
    with pytest.raises(ValueError, match="already exists"):
        zorder_key(grid_df.withColumn("__zorder", F.lit(1)), ["x"])


def test_zkey_plan_is_codegen_no_shuffle(spark, grid_df):
    """The key projection must be a plain scan-side expression: no
    Exchange, no Python workers, no Window."""
    plan = zorder_key(grid_df, ["x", "y"], bits=6) \
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Window", "Python", "InPandas"):
        assert bad not in plan, f"{bad} leaked into the z-key plan"


def _py_hilbert(order, x, y):
    """Reference xy→d (the standard reflect-and-swap loop, MSB first)."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_reference_is_true_hilbert():
    """The Python reference itself: bijective on the full grid and every
    consecutive pair of cells is grid-ADJACENT (Manhattan distance 1) —
    the property Z-order lacks and the whole reason hilbert_key exists."""
    order = 4
    n = 1 << order
    seen = {}
    for x in range(n):
        for y in range(n):
            d = _py_hilbert(order, x, y)
            assert d not in seen
            seen[d] = (x, y)
    assert len(seen) == n * n
    pts = [seen[d] for d in range(n * n)]
    assert all(abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1
               for a, b in zip(pts, pts[1:]))


def test_hilbert_key_matches_reference_exactly(spark):
    """With explicit integer boundaries (no sketch fuzz) the Spark key
    equals the reference on every cell of an 8×8 grid."""
    from faisssearcher_spark.operators.layout import hilbert_key

    rows = [(8 * x + y, float(x), float(y))
            for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    bnds = [float(v) for v in range(1, 8)]
    got = hilbert_key(df, ["x", "y"], bits=3,
                      boundaries={"x": bnds, "y": bnds}).collect()
    for r in got:
        assert r["__hilbert"] == _py_hilbert(3, int(r["x"]), int(r["y"])), \
            (r["x"], r["y"])


def test_hilbert_layout_beats_zorder_spans(spark, grid_df, tmp_path):
    """The locality claim, measured from real parquet footers: at equal
    file count the Hilbert layout's total per-file min-max AREA
    (span_x · span_y summed over files) is smaller than Z-order's —
    consecutive Hilbert cells are always adjacent, the Z-curve jumps.
    Measured ~34% smaller on this grid; pinned loosely as strictly
    better."""
    from faisssearcher_spark.operators.layout import (hilbert_layout,
                                                      zorder_layout)

    zpath, hpath = str(tmp_path / "zo"), str(tmp_path / "hi")
    zorder_layout(grid_df, ["x", "y"], n_files=16, bits=6) \
        .write.parquet(zpath)
    hilbert_layout(grid_df, ["x", "y"], n_files=16, bits=6) \
        .write.parquet(hpath)

    def area(path):
        sp = _file_spans(path, ["x", "y"])
        return sum(a * b for a, b in zip(sp["x"], sp["y"]))

    za, ha = area(zpath), area(hpath)
    assert ha < za, (ha, za)
    # both are real 2-d layouts (each file bounded in both columns)
    sp = _file_spans(hpath, ["x", "y"])
    assert sum(sp["x"]) / len(sp["x"]) < 50
    assert sum(sp["y"]) / len(sp["y"]) < 50


def test_hilbert_key_plan_no_python_no_shuffle(spark, grid_df):
    """bits Generate barriers, still scan-side: no Exchange, no Python.
    (Window stays out too — the key is a pure projection chain.)"""
    from faisssearcher_spark.operators.layout import hilbert_key

    plan = hilbert_key(grid_df, ["x", "y"], bits=6) \
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Window", "Python", "InPandas"):
        assert bad not in plan, f"{bad} leaked into the hilbert-key plan"


def test_hilbert_validation(spark, grid_df):
    from faisssearcher_spark.operators.layout import hilbert_key

    with pytest.raises(ValueError, match="2-D"):
        hilbert_key(grid_df, ["x"])
    with pytest.raises(ValueError, match="2-D"):
        hilbert_key(grid_df, ["x", "y", "row_id"])
    with pytest.raises(ValueError, match="already exists"):
        hilbert_key(grid_df.withColumn("__hilbert", F.lit(1)), ["x", "y"])


def test_date_columns_bucket_by_value_not_null(spark):
    """DATE doesn't cast to double (NULL outside ANSI) — the key must
    route dates through timestamp or every row silently buckets to 0."""
    import datetime as dt

    rows = [(i, dt.date(2020, 1, 1) + dt.timedelta(days=i), float(i))
            for i in range(64)]
    df = spark.createDataFrame(rows, "id long, d date, x double")
    out = zorder_key(df, ["d", "x"], bits=4).collect()
    zs = {r["id"]: r["__zorder"] for r in out}
    assert len(set(zs.values())) > 8   # dates actually spread buckets
    # same value in both dims -> z keys must be monotone along the diag
    assert zs[0] < zs[32] < zs[63]
