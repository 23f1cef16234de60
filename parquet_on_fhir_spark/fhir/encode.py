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
        schema = derive_schema(spark, ndjson_path, resource_type=resource_type)
    df = spark.read.schema(schema).json(ndjson_path)
    if validate:
        check_or_raise(df, resource_type)
    if annotations:
        df = annotate(df)
    return df


def encode_mixed_ndjson(
    spark: SparkSession,
    ndjson_path: str,
    out_root: str,
    annotations: bool = True,
) -> dict[str, int]:
    """Split a mixed-resource NDJSON stream into one Parquet-on-FHIR
    table per resourceType (the spec's fundamental layout: one table per
    resource definition, README.md:26-35).

    Two passes, both distributed: (1) tag each line with its
    resourceType (cheap get_json_object — no full parse) and write the
    raw lines partitioned by type; (2) per type, derive that type's
    sparse schema and encode its partition. Returns {resourceType: rows}.

    Object-store-safe: the per-type partition list comes from ONE
    distributed ``distinct(resourceType)`` aggregate (bounded by the
    ~150 FHIR resource types), never from local-filesystem globbing —
    the same code path works on file:/, s3a:/ or hdfs:/ roots. Row
    counts are taken from that same aggregate, not per-type count jobs.
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(ndjson_path)
    tagged = raw.select(
        F.get_json_object("value", "$.resourceType").alias("resourceType"), "value"
    ).filter(F.col("resourceType").isNotNull())
    staging = f"{out_root}/_staging"
    tagged.write.mode("overwrite").partitionBy("resourceType").text(staging)

    counts: dict[str, int] = {
        r["resourceType"]: r["n"]
        for r in tagged.groupBy("resourceType").agg(F.count("*").alias("n")).collect()
    }
    for rtype in sorted(counts):
        df = encode_ndjson(
            spark,
            f"{staging}/resourceType={rtype}",
            resource_type=rtype,
            annotations=annotations,
        )
        write_table(df, f"{out_root}/{rtype}")
    return counts


def encode_ndjson_tolerant(
    spark: SparkSession,
    ndjson_path: str,
    schema: T.StructType | None = None,
    resource_type: str | None = None,
    annotations: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Encode with corrupt-line quarantine: returns (good, bad) where
    ``bad`` holds unparseable lines verbatim (PERMISSIVE mode +
    columnNameOfCorruptRecord). At 100 TB a single malformed line must
    not kill the job — it must land in a quarantine table for replay."""
    if schema is None:
        schema = derive_schema(spark, ndjson_path, resource_type=resource_type)
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    df = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(ndjson_path)
    ).cache()  # required: corrupt-record column can't be queried off a bare scan
    bad = df.filter(df["_corrupt_record"].isNotNull()).select("_corrupt_record")
    good = df.filter(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    if annotations:
        good = annotate(good)
    return good, bad


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
