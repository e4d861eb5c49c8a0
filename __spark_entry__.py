"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship per-partition verdict roll-up at
sf0.001; ``queries()`` / ``oracle_sql()`` expose every SQL-expressible
operator from SURVEY.md §2 with an independent DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from json_spark.plans.registry import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    gate_order,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["verdict_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so queries without a fresh driver-gate row come first — the
    gate samples the first 50 entries, and a query whose implementation
    changed since its last check must re-enter the window."""
    return gate_order(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return gate_order(ORACLE_SQL)
