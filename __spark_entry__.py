"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual implementations live in ``parquet_on_fhir_spark/suite/``;
this file only adapts them to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from parquet_on_fhir_spark.suite import all_queries  # noqa: E402
from parquet_on_fhir_spark.suite.relational import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (shipping-priority: 3-table join + agg + top-k)
    on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {q.name: q.fn for q in all_queries()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query; ops whose
    semantics are not ANSI-SQL-expressible are omitted (rows-only)."""
    return {q.name: q.oracle for q in all_queries() if q.oracle is not None}
