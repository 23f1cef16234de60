"""F4 — decode: Parquet-on-FHIR table → FHIR JSON (README.md:11-13).

Losslessness contract: "FHIR JSON converted to this format should be
able to be regenerated from the format without any loss of data."
Inverse of encode:

1. strip every ``__``-prefixed annotation field at all nesting depths
   (inverse of the naming rule, README.md:304-307)
2. null-prune bottom-up: structs whose children are all null become
   null, arrays that end up empty become null — so regenerated JSON
   omits absent elements exactly like the sparse input
   (README.md:15-18, 43-45)
3. ``to_json`` (ignoreNullFields) → one JSON document per row

All expression-level (struct rebuilds + higher-order transforms); the
decode of a 100 TB table is a map-only scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_on_fhir_spark.fhir.types import DECIMAL_TYPES, fhir_type_of


def _clean_type(dtype: T.DataType) -> T.DataType:
    """Target type after annotation-stripping (for null literals)."""
    if isinstance(dtype, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _clean_type(f.dataType), True)
                for f in dtype.fields
                if not f.name.startswith("__")
            ]
        )
    if isinstance(dtype, T.ArrayType):
        return T.ArrayType(_clean_type(dtype.elementType), dtype.containsNull)
    return dtype


def _clean(col: Column, dtype: T.DataType) -> Column:
    if isinstance(dtype, T.StructType):
        kept = [f for f in dtype.fields if not f.name.startswith("__")]
        if not kept:
            return F.lit(None).cast(T.NullType())
        children = [_clean(col.getField(f.name), f.dataType).alias(f.name) for f in kept]
        rebuilt = F.struct(*children)
        all_null = reduce(lambda a, b: a & b, [c.isNull() for c in children])
        return F.when(col.isNull() | all_null, F.lit(None).cast(_clean_type(dtype))).otherwise(
            rebuilt
        )
    if isinstance(dtype, T.ArrayType):
        cleaned = F.transform(col, lambda x: _clean(x, dtype.elementType))
        non_null = F.filter(cleaned, lambda x: x.isNotNull())
        return F.when(
            col.isNull() | (F.size(non_null) == 0),
            F.lit(None).cast(_clean_type(dtype)),
        ).otherwise(non_null)
    return col


def strip_annotations(df: DataFrame) -> DataFrame:
    """Remove ``__*`` fields at every nesting level; null-prune empties."""
    cols = [
        _clean(F.col(f.name), f.dataType).alias(f.name)
        for f in df.schema.fields
        if not f.name.startswith("__")
    ]
    return df.select(*cols)


def _decimal_field_names(dtype: T.DataType, out: set[str]) -> None:
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            if (
                isinstance(f.dataType, T.StringType)
                and fhir_type_of(f.name) in DECIMAL_TYPES
            ):
                out.add(f.name)
            _decimal_field_names(f.dataType, out)
    elif isinstance(dtype, T.ArrayType):
        _decimal_field_names(dtype.elementType, out)


def to_fhir_json(df: DataFrame, json_col: str = "json") -> DataFrame:
    """One FHIR JSON document (string) per resource row.

    FHIR decimals are stored as lossless STRINGS (README.md:343-351) but
    must regenerate as JSON *numbers*; after serialization every
    decimal-kinded field is unquoted by name (the value text itself is
    preserved verbatim, trailing zeros included — FHIR lexical rules
    guarantee it is a valid JSON number, README.md:84-86).
    """
    clean = strip_annotations(df)
    js = F.to_json(F.struct(*clean.columns))
    dec_fields: set[str] = set()
    _decimal_field_names(df.schema, dec_fields)
    for name in sorted(dec_fields):
        js = F.regexp_replace(
            js,
            f'"({name})":"(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"',
            '"$1":$2',
        )
    return clean.select(js.alias(json_col))


def write_ndjson(df: DataFrame, path: str) -> None:
    """Decode and write as NDJSON (one resource per line)."""
    to_fhir_json(df).write.mode("overwrite").text(path)
