"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship parse→enrich→route→aggregate
pipeline over sf0.001. ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle; the
driver compares them at sf0.01 (row-count + schema + value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentelemetry_collector_contrib_spark.plans.queries import ORACLES, QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: route + count the sf0.001 events stream through the
    log pipeline (routingconnector + countconnector semantics)."""
    from opentelemetry_collector_contrib_spark.plans.queries import (
        q_route_connector,
    )

    return q_route_connector(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, same column aliases."""
    return dict(ORACLES)
