"""Physical-plan inspection helpers.

The engine's scale guarantees are *plan-shape* guarantees: the flagship
knn path must broadcast its small side and push the rank limit below the
shuffle; parquet scans must carry pushed filters and pruned schemas.
These helpers make those properties assertable in tests and CI instead of
eyeballed in ``.explain`` output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_window_group_limit(df: DataFrame) -> bool:
    """True when Catalyst inserted a WindowGroupLimit (partial per-partition
    top-k below the exchange) — the scalable rank≤k plan."""
    return "WindowGroupLimit" in executed_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    plan = executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan.

    Spark's plan toString truncates long field lists ("..." with no
    closing bracket), so parse up to the bracket, an ellipsis, or the
    next `key:` — whichever comes first.
    """
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(
            r"PushedFilters: \[(.*?)(?:\]|\.\.\.|, [A-Z]\w+:)", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out
