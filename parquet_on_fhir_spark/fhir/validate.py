"""F14 — invariant validation (README.md:29-41, 139-145).

- ``resourceType`` present and constant per table (logically required;
  the example files mark it physically optional — SURVEY.md §1.4 Δ1)
- choice types: at most one concrete ``value[x]`` variant non-null per
  row (README.md:139-145)
- unsigned kinds (positiveInt/unsignedInt) ≥ 0 — the documented Spark
  deviation (no unsigned ints; SURVEY.md §7)

One aggregate job over the invariant columns; everything is counted in
a single pass.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_on_fhir_spark.fhir.types import ELEMENT_TYPES, choice_group


class FhirValidationError(ValueError):
    pass


def _choice_groups(schema: T.StructType) -> dict[str, list[str]]:
    groups: dict[str, list[str]] = defaultdict(list)
    for f in schema.fields:
        if f.name.startswith("__") or f.name.startswith("_"):
            continue
        g = choice_group(f.name)
        if g:
            groups[g].append(f.name)
    return {g: fields for g, fields in groups.items() if len(fields) > 1}


def _effectively_non_null(col, dtype: T.DataType):
    """Present AND carrying data: real-world Parquet-on-FHIR files (incl.
    the reference's own examples) store unused choice variants as
    present-but-all-null structs, which the exclusivity rule must treat
    as absent."""
    if isinstance(dtype, T.StructType):
        child = None
        for f in dtype.fields:
            c = _effectively_non_null(col.getField(f.name), f.dataType)
            child = c if child is None else (child | c)
        return col.isNotNull() & child if child is not None else col.isNotNull()
    if isinstance(dtype, T.ArrayType):
        return col.isNotNull() & (F.size(col) > 0)
    return col.isNotNull()


def validate(df: DataFrame, resource_type: str | None = None) -> dict:
    """Run the invariant checks; returns a report dict (one Spark job)."""
    aggs = []
    if "resourceType" in df.columns:
        aggs.append(F.countDistinct("resourceType").alias("__n_rt"))
        aggs.append(F.count(F.when(F.col("resourceType").isNull(), 1)).alias("__null_rt"))
        if resource_type is not None:
            aggs.append(
                F.count(F.when(F.col("resourceType") != resource_type, 1)).alias(
                    "__wrong_rt"
                )
            )
    schema_by_name = {f.name: f.dataType for f in df.schema.fields}
    groups = _choice_groups(df.schema)
    for g, fields in groups.items():
        non_null = sum(
            F.when(_effectively_non_null(F.col(f2), schema_by_name[f2]), 1).otherwise(0)
            for f2 in fields
        )
        aggs.append(F.count(F.when(non_null > 1, 1)).alias(f"__choice_{g}"))
    for f in df.schema.fields:
        ft = ELEMENT_TYPES.get(f.name)
        if ft in ("positiveInt", "unsignedInt") and isinstance(
            f.dataType, (T.IntegerType, T.LongType)
        ):
            bound = 1 if ft == "positiveInt" else 0
            aggs.append(
                F.count(F.when(F.col(f.name) < bound, 1)).alias(f"__unsigned_{f.name}")
            )

    report: dict = {"has_resource_type": "resourceType" in df.columns, "errors": []}
    if not aggs:
        if "resourceType" not in df.columns:
            report["errors"].append("missing resourceType column (README.md:29-35)")
        return report
    row = df.agg(*aggs).collect()[0].asDict()
    if "resourceType" not in df.columns:
        report["errors"].append("missing resourceType column (README.md:29-35)")
    else:
        if row.get("__n_rt", 0) > 1:
            report["errors"].append("resourceType not constant (README.md:33-35)")
        if row.get("__null_rt", 0) > 0:
            report["errors"].append("null resourceType values (README.md:39-41)")
        if row.get("__wrong_rt", 0):
            report["errors"].append(
                f"resourceType != {resource_type} on {row['__wrong_rt']} rows"
            )
    for g in groups:
        if row.get(f"__choice_{g}", 0) > 0:
            report["errors"].append(
                f"choice group '{g}[x]' has >1 non-null variant on "
                f"{row[f'__choice_{g}']} rows (README.md:139-145)"
            )
    for k, v in row.items():
        if k.startswith("__unsigned_") and v > 0:
            report["errors"].append(f"{k.removeprefix('__unsigned_')}: {v} values out of unsigned range")
    return report


def check_or_raise(df: DataFrame, resource_type: str | None = None) -> None:
    report = validate(df, resource_type)
    if report["errors"]:
        raise FhirValidationError("; ".join(report["errors"]))
