"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (sales-summary mart over
lineitem ⨝ orders) at sf0.001. ``queries()`` / ``oracle_sql()`` expose
the full named-query registry from ``sales_etl_spark.plans`` — one
entry per implemented operator from SURVEY.md §2, each with a DuckDB
oracle twin where ANSI SQL can express it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from sales_etl_spark.plans import QUERY_REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["agg_sales_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.builder for name, qd in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query; keys without one get the driver's
    weaker rows-only check (non-SQL-expressible operators)."""
    return {
        name: qd.oracle
        for name, qd in QUERY_REGISTRY.items()
        if qd.oracle is not None
    }
