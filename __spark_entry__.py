"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (exact top-5 cosine k-NN over the
  embeddings corpus with payload carry) at sf0.001 — smoke check.
- ``queries()``: every implemented operator from SURVEY.md §2 plus the
  north-star extensions, as (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()``: matching DuckDB SQL per query (see
  faisssearcher_spark/registry.py for the definitions side by side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from faisssearcher_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.q_knn_cosine_top5(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
