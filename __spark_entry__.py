"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented capability from
SURVEY.md §2 (plus the training-data ops) for the driver's DuckDB
side-by-side correctness check at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shovel_spark.demo_queries import ORACLE_SQL, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse → enrich → route pipeline over pages derived from
    /root/testdata/sf0.001 documents; returns per-(sink, status) counts."""
    return SPARK_QUERIES["pipeline_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2); aliases match
    oracle_sql column names exactly."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same aliases, same rounding)."""
    return dict(ORACLE_SQL)
