"""FHIR format layer — the reference spec's own operation surface
(SURVEY.md §2A F1-F14; /root/reference/README.md):

- types:       FHIR primitive → Spark type mapping (F2)
- schema:      sparse schema derivation from data + type rules (F1)
- encode:      lossless FHIR NDJSON → annotated DataFrame/parquet (F3, F5-F9)
- annotations: date-range / decimal / quantity-canonical columns (F10-F12)
- decode:      DataFrame → FHIR JSON round-trip (F4)
- merge:       schema merge across tables of one resource type (F13)
- validate:    resourceType + choice-type invariants (F14)
"""

from parquet_on_fhir_spark.fhir.encode import encode_ndjson, write_table  # noqa: F401
from parquet_on_fhir_spark.fhir.decode import to_fhir_json  # noqa: F401
from parquet_on_fhir_spark.fhir.schema import derive_schema  # noqa: F401
from parquet_on_fhir_spark.fhir.annotations import annotate  # noqa: F401
from parquet_on_fhir_spark.fhir.merge import merge_tables, union_resources  # noqa: F401
from parquet_on_fhir_spark.fhir.validate import validate  # noqa: F401
