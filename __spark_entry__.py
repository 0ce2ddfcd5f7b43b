"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over bankcreditunion_datapipeline_spark.queries: every implemented
operator from SURVEY.md §2 (plus the LLM-data extensions) is registered there
as a (Spark builder, DuckDB oracle SQL) pair with matching column aliases.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bankcreditunion_datapipeline_spark import queries as _q  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.flagship(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark_fn for name, q in _q.registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in _q.registry().items() if q.oracle is not None}
