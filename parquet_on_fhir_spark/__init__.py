"""parquet_on_fhir_spark — a PySpark-native analytics engine with the
capabilities of the aehrc/parquet-on-fhir format specification
(/root/reference/README.md, v0.1, CC0-1.0), plus LLM-data-pipeline
operators, designed for 100 TB scale.

Everything is expressed through the Spark DataFrame/SQL API so Catalyst
and Tungsten pick the physical strategy; Python UDFs appear only where
built-in operators genuinely cannot express the semantics (and then as
Arrow-vectorized pandas UDFs).
"""

__version__ = "0.1.0"

from parquet_on_fhir_spark.session import get_session  # noqa: F401
from parquet_on_fhir_spark.api import load_table, register_views  # noqa: F401
