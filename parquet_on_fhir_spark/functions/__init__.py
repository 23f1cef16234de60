"""Scalar/column function library: FHIR partial-date bounds, vector math.

All pure Catalyst ``Column`` expressions — JVM-side, codegen-friendly,
no Python UDFs (SURVEY.md §4: stay inside whole-stage codegen).
"""

from parquet_on_fhir_spark.functions.partial_date import (  # noqa: F401
    fhir_date_end,
    fhir_date_start,
)
from parquet_on_fhir_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
