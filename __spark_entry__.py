"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction pipeline; ``queries`` /
``oracle_sql`` expose the operator registry from
high_performance_docling_spark.entry_queries (Spark impl + DuckDB oracle
pairs; non-SQL-expressible pipeline entries are rows-only).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from high_performance_docling_spark.entry_queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthesize the interleaved corpus (north-rule input shape)
    and run the full S0→S7 span-extraction pipeline."""
    return QUERIES["extract_spans_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
