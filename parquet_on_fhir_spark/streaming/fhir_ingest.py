"""Continuous FHIR NDJSON ingest → Parquet-on-FHIR table (Structured
Streaming).

The batch encoder (fhir/encode.py) is a schema-driven projection, so the
same transformation graph runs unchanged as a file stream: new NDJSON
files landing in a directory are parsed with the derived (or
definition-derived) schema, annotated, and appended to the table with
exactly-once semantics from the checkpoint. At production scale the
source directory is an object-store prefix fed by an export job and the
trigger is continuous or periodic; AvailableNow gives run-to-completion
batches for backfills and tests — the query graph is identical.

Schema discipline: a stream needs a FIXED schema up front (inference
over a growing directory would race ingestion). Callers either pass one,
or we take the R4 definition-derived schema for the resource type, or —
for bootstrap-from-sample — derive from the files already present.
Later files with new fields are NOT silently dropped: unparseable or
extra-field rows keep their raw line in ``_corrupt_record`` when
``quarantine=True``, matching the batch encoder's tolerant mode.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from parquet_on_fhir_spark.fhir.annotations import annotate


def stream_encode_ndjson(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema: T.StructType | None = None,
    resource_type: str | None = None,
    annotations: bool = True,
    available_now: bool = True,
    quarantine: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start (and with ``available_now`` run to completion) a streaming
    NDJSON→Parquet-on-FHIR encode job. Returns the StreamingQuery; the
    caller owns ``awaitTermination``.

    Exactly-once into ``out_dir`` via the file-sink commit log under
    ``checkpoint_dir`` — re-running after failure neither loses nor
    duplicates resources.
    """
    if schema is None:
        if resource_type is not None:
            from parquet_on_fhir_spark.fhir.r4_elements import (
                RESOURCES,
                definition_schema,
            )

            if resource_type in RESOURCES:
                schema = definition_schema(resource_type)
        if schema is None:
            # bootstrap from the files already present (one batch job)
            from parquet_on_fhir_spark.fhir.schema import derive_schema

            schema = derive_schema(spark, in_dir, resource_type=resource_type)
    if quarantine and "_corrupt_record" not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType(), True)]
        )

    reader = (
        spark.readStream.schema(schema)
        .option("mode", "PERMISSIVE" if quarantine else "DROPMALFORMED")
    )
    if quarantine:
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.json(in_dir)
    if annotations:
        df = annotate(df)

    writer = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
