"""Data-quality constraint checking — Deequ-style, one pass, pure Catalyst.

A 100 TB ingest needs its gatekeeping to cost ONE scan: every constraint
below compiles to an aggregate expression, all constraints for a frame
fold into a single ``agg(...)`` (partial aggregation map-side, one
shuffle of one row per partition), and the verdict table is assembled
driver-free from that single row. No sampling, no per-rule jobs, no
Python.

Usage::

    from faisssearcher_spark.operators import expect

    report = expect.check(df, [
        expect.not_null("doc_id"),
        expect.unique("doc_id"),
        expect.completeness("text", min_ratio=0.99),
        expect.in_range("n_chars", 1, 1_000_000),
        expect.matches("lang", r"^[a-z]{2}$"),
        expect.accepted_values("source", ["web", "books"]),
        expect.row_count_between(1, None),
    ])
    # -> rows (constraint, column, passed, observed); observed is the
    #    violation count (or observed ratio/count where noted)
    assert report.filter("NOT passed").count() == 0

Each helper returns a ``Constraint`` carrying its aggregate expression;
:func:`check` stacks the computed values into the long-format report.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One check: ``observed`` is an aggregate expression over the frame;
    ``predicate`` maps the observed value to pass/fail."""
    name: str
    column: str
    observed: Column          # aggregate expression
    threshold: Column         # boolean expression over F.col("observed")


def _violations(cond: Column) -> Column:
    """Count of rows violating ``cond`` (null-safe: a null condition
    counts as a violation — an unparseable value is not a pass; an empty
    frame has zero violations)."""
    return F.coalesce(
        F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)),
        F.lit(0))


def not_null(col: str) -> Constraint:
    return Constraint("not_null", col,
                      _violations(F.col(col).isNotNull()).cast("double"),
                      F.col("observed") == 0)


def completeness(col: str, *, min_ratio: float) -> Constraint:
    """Fraction of non-null values ≥ min_ratio. ``observed`` = the ratio."""
    ratio = (F.count(col) / F.greatest(F.count(F.lit(1)), F.lit(1)))
    return Constraint("completeness", col, ratio.cast("double"),
                      F.col("observed") >= min_ratio)


def unique(col: str) -> Constraint:
    """No value occurs twice (nulls ignored, as in SQL UNIQUE).
    ``observed`` = n_rows − n_distinct. Exact — uses count_distinct, the
    one constraint whose aggregate is distinct-based; Spark plans it as
    an expand + two-level aggregate, still one scan."""
    return Constraint("unique", col,
                      (F.count(col) - F.count_distinct(F.col(col)))
                      .cast("double"),
                      F.col("observed") == 0)


def in_range(col: str, lo: float | None, hi: float | None) -> Constraint:
    """Every NON-NULL value within bounds — nulls are not range
    violations (they are `not_null`'s job; the same null exemption
    `matches`/`accepted_values` apply, so a null is never counted
    twice across constraints)."""
    if lo is None and hi is None:
        raise ValueError("in_range needs at least one bound")
    cond = F.col(col).isNull()
    bounds = F.lit(True)
    if lo is not None:
        bounds = bounds & (F.col(col) >= lo)
    if hi is not None:
        bounds = bounds & (F.col(col) <= hi)
    return Constraint("in_range", col,
                      _violations(cond | bounds).cast("double"),
                      F.col("observed") == 0)


def matches(col: str, pattern: str) -> Constraint:
    """Every non-null value matches the (Java) regex."""
    cond = F.col(col).isNull() | F.col(col).rlike(pattern)
    return Constraint("matches", col, _violations(cond).cast("double"),
                      F.col("observed") == 0)


def accepted_values(col: str, values: Sequence[str]) -> Constraint:
    if not values:
        raise ValueError("accepted_values needs a non-empty value list")
    cond = F.col(col).isNull() | F.col(col).isin(*values)
    return Constraint("accepted_values", col,
                      _violations(cond).cast("double"),
                      F.col("observed") == 0)


def row_count_between(lo: int | None, hi: int | None) -> Constraint:
    if lo is None and hi is None:
        raise ValueError("row_count_between needs at least one bound")
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col("observed") >= lo)
    if hi is not None:
        pred = pred & (F.col("observed") <= hi)
    return Constraint("row_count_between", "*",
                      F.count(F.lit(1)).cast("double"), pred)


def non_negative(col: str) -> Constraint:
    c = in_range(col, 0, None)
    return Constraint("non_negative", col, c.observed, c.threshold)


def check(df: DataFrame, constraints: Sequence[Constraint]) -> DataFrame:
    """Evaluate all constraints in ONE aggregation pass.

    Returns ``(constraint, column, passed, observed)`` — one row per
    constraint. The plan is a single global ``agg`` over ``df`` (every
    per-row condition partial-aggregates map-side; one 1-row exchange)
    followed by a driver-free explode of the observed values into the
    long report."""
    if not constraints:
        raise ValueError("constraints must be non-empty")
    names = [f"__obs_{i}" for i in range(len(constraints))]
    row = df.agg(*[c.observed.alias(n)
                   for c, n in zip(constraints, names)])
    report_rows = F.array(*[
        F.struct(
            F.lit(i).alias("idx"),
            F.lit(c.name).alias("constraint"),
            F.lit(c.column).alias("column"),
            F.col(n).alias("observed"))
        for i, (c, n) in enumerate(zip(constraints, names))])
    long = (row.select(F.explode(report_rows).alias("r"))
            .select("r.idx", "r.constraint", "r.column", "r.observed"))
    # re-apply each predicate against its own observed value; match by
    # positional idx so duplicate (name, column) constraints with
    # different bounds stay independent
    verdict = F.lit(None).cast("boolean")
    for i, c in enumerate(constraints):
        verdict = F.when(F.col("idx") == i, c.threshold).otherwise(verdict)
    return long.select("constraint", "column",
                       F.coalesce(verdict, F.lit(False)).alias("passed"),
                       "observed")
