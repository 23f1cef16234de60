"""Bucketed tables: co-located joins without a shuffle (SURVEY.md §4; see the Spark SQL
bucketing docs: spark.apache.org/docs/latest/sql-data-sources-load-save-functions.html).

At 100 TB, a repeated join key (patient id, order key) justifies paying
one write-time shuffle so every subsequent join on that key is
exchange-free: both sides are hash-bucketed the same way, so the
sort-merge join reads matching buckets directly. This module is the
write/read pair plus a plan assertion helper used in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 8
) -> None:
    """Persist as a bucketed+sorted managed table (spark-warehouse)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table_name)  # managed: lives under spark.sql.warehouse.dir
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — the
    plan contains no Exchange for either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def plan_of(df: DataFrame) -> str:
    """Formatted physical plan as a string (for assertions/audits)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()
