"""F10-F12 — query-acceleration annotation columns (README.md:301-381).

Naming: ``__<element>_<annotation>`` — two leading underscores
(README.md:304-307). Three standard annotations:

- date range  → ``__x_start`` / ``__x_end`` TIMESTAMP (README.md:314-341)
- decimal     → ``__x_numeric`` DECIMAL(38,6)          (README.md:343-363)
- quantity    → ``__x_canonical`` struct               (README.md:365-381)

Placement matches the reference's example files (SURVEY.md §1.4):
decimal annotations for fields NESTED in structs/arrays are added inside
the parent struct (``valueQuantity.__value_numeric``,
``extension.__valueDecimal_numeric``); top-level elements get sibling
columns. All pure Catalyst expressions evaluated at encode time — at
100 TB this is a map-only pass fused into the write stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_on_fhir_spark.fhir.types import (
    DATE_TYPES,
    DECIMAL_TYPES,
    fhir_type_of,
    is_quantity_shaped,
)
from parquet_on_fhir_spark.fhir.ucum import canonical_quantity
from parquet_on_fhir_spark.functions.partial_date import fhir_date_end, fhir_date_start

DECIMAL38 = T.DecimalType(38, 6)

# shared structural predicate (types.is_quantity_shaped): value + a
# unit/code/currency sibling — Identifier (system, value) never matches
_is_quantity_struct = is_quantity_shaped


def _annotate_struct(col: Column, dtype: T.StructType) -> Column:
    """Rebuild a struct value with annotation fields inserted (recursive)."""
    out_fields: list[Column] = []
    for f in dtype.fields:
        child = _annotate_any(col.getField(f.name), f.dataType)
        out_fields.append(child.alias(f.name))
        if f.name.startswith("__"):
            continue
        ft = fhir_type_of(f.name)
        if ft in DECIMAL_TYPES and not isinstance(f.dataType, (T.StructType, T.ArrayType)):
            if f"__{f.name}_numeric" not in dtype.fieldNames():
                out_fields.append(
                    col.getField(f.name).try_cast(DECIMAL38).alias(f"__{f.name}_numeric")
                )
    # quantity struct: decimal annotation for its string `value` child
    if _is_quantity_struct(dtype) and "__value_numeric" not in dtype.fieldNames():
        out_fields.append(
            col.getField("value").try_cast(DECIMAL38).alias("__value_numeric")
        )
    return F.struct(*out_fields)


def _annotate_any(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StructType):
        rebuilt = _annotate_struct(col, dtype)
        return F.when(col.isNull(), F.lit(None)).otherwise(rebuilt)
    if isinstance(dtype, T.ArrayType):
        return F.transform(col, lambda x: _annotate_any(x, dtype.elementType))
    return col


def annotate(
    df: DataFrame,
    date_ranges: bool = True,
    decimals: bool = True,
    quantity_canonical: bool = True,
) -> DataFrame:
    """Add the standard annotations to an encoded resource DataFrame."""
    cols: list[Column] = []
    extra: list[Column] = []
    existing = set(df.columns)
    for f in df.schema.fields:
        if f.name.startswith("__"):
            cols.append(F.col(f.name))
            continue
        base = _annotate_any(F.col(f.name), f.dataType) if decimals else F.col(f.name)
        cols.append(base.alias(f.name))
        ft = fhir_type_of(f.name)
        if (
            date_ranges
            and ft in DATE_TYPES
            and isinstance(f.dataType, T.StringType)
        ):
            if f"__{f.name}_start" not in existing:
                extra.append(fhir_date_start(F.col(f.name)).alias(f"__{f.name}_start"))
                extra.append(fhir_date_end(F.col(f.name)).alias(f"__{f.name}_end"))
        if (
            decimals
            and ft in DECIMAL_TYPES
            and isinstance(f.dataType, T.StringType)
            and f"__{f.name}_numeric" not in existing
        ):
            extra.append(F.col(f.name).try_cast(DECIMAL38).alias(f"__{f.name}_numeric"))
        if (
            quantity_canonical
            and _is_quantity_struct(f.dataType)
            and "code" in f.dataType.fieldNames()
            and f"__{f.name}_canonical" not in existing
        ):
            extra.append(
                F.when(
                    F.col(f.name).isNull(),
                    F.lit(None),
                )
                .otherwise(
                    canonical_quantity(
                        F.col(f"{f.name}.value"), F.col(f"{f.name}.code")
                    )
                )
                .alias(f"__{f.name}_canonical")
            )
    return df.select(*cols, *extra)
