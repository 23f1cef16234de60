"""F3 + F5-F9 — encode: FHIR NDJSON → annotated Parquet-on-FHIR table.

The heavy lifting (repeating elements → LIST, complex/backbone elements
→ groups, choice-type sibling fields, recursive extensions, primitive
``_field`` extensions) is all carried by the derived nested schema: the
spec's shapes (README.md:108-297) are exactly Spark's
StructType/ArrayType composition, so the distributed Jackson parse
materializes them directly — there is no per-construct code path, which
is the point of building on a nested-columnar engine.

Extension recursion (README.md:202-248) is bounded by whatever depth the
derived schema observed (Spark types are non-recursive; SURVEY.md §7) —
matching the examples' depth-2 usage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from parquet_on_fhir_spark.fhir.annotations import annotate
from parquet_on_fhir_spark.fhir.schema import derive_schema
from parquet_on_fhir_spark.fhir.validate import check_or_raise


def encode_ndjson(
    spark: SparkSession,
    ndjson_path: str,
    schema: T.StructType | None = None,
    resource_type: str | None = None,
    annotations: bool = True,
    validate: bool = True,
) -> DataFrame:
    """Parse FHIR NDJSON into a (optionally annotated, validated)
    DataFrame with a sparse derived schema.

    Parsing runs distributed on executors (one pass); annotation is a
    fused projection; validation is one aggregate over the invariant
    columns.
    """
    if schema is None:
        schema = derive_schema(spark, ndjson_path)
    df = spark.read.schema(schema).json(ndjson_path)
    if validate:
        check_or_raise(df, resource_type)
    if annotations:
        df = annotate(df)
    return df


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    int96_timestamps: bool = False,
) -> None:
    """Write a Parquet-on-FHIR table: SNAPPY + dictionary encoding +
    min/max statistics, matching the reference examples' footer config
    (SURVEY.md §0 provenance: the spec's own files were written by Spark).

    ``int96_timestamps``: the spec types date-range annotations as int96
    TIMESTAMP(MILLIS) (README.md:329-330); Spark writes TIMESTAMP_MICROS
    by default. Flip on for byte-level spec fidelity.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    if int96_timestamps:
        spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        writer = df.write.mode("overwrite").option("compression", "snappy")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    finally:
        if int96_timestamps:
            spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
