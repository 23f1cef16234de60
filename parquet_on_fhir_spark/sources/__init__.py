"""Source/sink connectors (SURVEY.md §2B Q1-Q6, Q73).

Thin, convention-carrying wrappers over Spark's readers: explicit
schemas (never inferSchema in production paths), mergeSchema for the
spec's sparse-table union semantics, nanosecond-timestamp normalization,
and binaryFile for multimodal payloads. Formats needing external jars
(Delta/Iceberg/Hudi, JDBC drivers) are stubbed behind import/option
checks with a clear error.
"""

from parquet_on_fhir_spark.sources.readers import (  # noqa: F401
    read_binary_files,
    read_csv,
    read_ndjson,
    read_orc,
    read_parquet,
)
