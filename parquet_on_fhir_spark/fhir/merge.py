"""F13 — schema merge / table union (README.md:20-22).

"Multiple Parquet tables could exist for the same resource … these
schemas could be merged to produce a single table with the union of
those fields." Two Spark-native forms:

- at scan: ``mergeSchema=true`` multi-path parquet read (schema union
  resolved from footers in parallel)
- at plan: ``unionByName(allowMissingColumns=True)`` over DataFrames

Both are metadata-only until executed; neither shuffles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession


def merge_tables(spark: SparkSession, *paths: str) -> DataFrame:
    """Scan-level schema merge across parquet tables of one resource type."""
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def union_resources(*dfs: DataFrame) -> DataFrame:
    """Plan-level union with schema widening (missing columns → null —
    sparse-tolerance rule, README.md:43-45)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
