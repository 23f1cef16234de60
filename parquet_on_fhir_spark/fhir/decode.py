"""F4 — decode: Parquet-on-FHIR table → FHIR JSON (README.md:11-13).

Losslessness contract: "FHIR JSON converted to this format should be
able to be regenerated from the format without any loss of data."
Inverse of encode:

1. strip every ``__``-prefixed annotation field at all nesting depths
   (inverse of the naming rule, README.md:304-307)
2. null-prune bottom-up: structs whose children are all null become
   null, arrays that end up empty become null — so regenerated JSON
   omits absent elements exactly like the sparse input
   (README.md:15-18, 43-45). EXCEPTION: FHIR index-aligns a repeating
   primitive with its ``_<name>`` extension array via interior null
   placeholders ("given":["Jim",null] / "_given":[null,{...}],
   README.md:250-297) — for such paired arrays interior nulls are
   PRESERVED, and a member is dropped only when the whole pair is dead.
3. ``to_json`` (ignoreNullFields) → one JSON document per row

FHIR decimals are stored as lossless STRINGS (README.md:343-351) but
must regenerate as JSON *numbers*. Decimal positions are identified
STRUCTURALLY during the struct rebuild (never by a global name match on
the serialized text): each decimal-kinded string — by element name, or
the ``value`` child of a Quantity/Money-shaped struct — is wrapped in
NUL sentinels at its exact tree position, and after ``to_json`` a single
regex strips the quoted sentinel pair, turning just those tokens into
bare JSON numbers with their lexical text (trailing zeros included)
intact. A string field elsewhere that shares a decimal element's name
is untouched; NUL cannot occur in conformant FHIR strings (the spec's
string regex admits no control characters), so the sentinel cannot
collide with data.

All expression-level (struct rebuilds + higher-order transforms); the
decode of a 100 TB table is a map-only scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_on_fhir_spark.fhir.types import (
    DECIMAL_TYPES,
    fhir_type_of,
    is_quantity_shaped,
)

# JSON-number grammar (RFC 8259) — only values matching this are marked,
# so the sentinel-strip regex always leaves valid JSON behind
_JSON_NUM = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"
_SENT = "\x00"  # to_json escapes NUL as the 6-char text backslash-u0000


def _mark_decimal(col: Column) -> Column:
    return F.when(
        col.rlike(_JSON_NUM), F.concat(F.lit(_SENT), col, F.lit(_SENT))
    ).otherwise(col)


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


def _pair_name(name: str, names: set[str]) -> str | None:
    """The '_<name>' ⇄ '<name>' partner of a primitive-extension pair,
    if present among sibling field names."""
    if name.startswith("_") and not name.startswith("__"):
        return name[1:] if name[1:] in names else None
    return "_" + name if ("_" + name) in names else None


def _live(col: Column, dtype: T.DataType) -> Column:
    """Would ``_clean(col, dtype)`` produce a non-null value?

    A liveness predicate that mirrors _clean's null-pruning rules WITHOUT
    rebuilding the subtree (no struct construction, no decimal marking):
    expressions that need "does anything survive cleaning?" — the struct
    all-dead check, array emptiness, paired-array partner liveness — stay
    small instead of embedding a second (or third) copy of the full
    cleaning expression. Keeps decode's expression size linear in schema
    width on wide schemas with many ``_field`` pairs.

    Equivalences mirrored from _clean (kept in lockstep):
    - primitive: marking preserves nullness → live = isNotNull
    - struct: null iff raw null or every kept child cleans to null; a
      paired array member survives when itself OR its partner is live
    - array: null iff raw null or no element survives cleaning
    - struct with no kept fields: always cleans to null
    """
    if isinstance(dtype, T.StructType):
        kept = [f for f in dtype.fields if not f.name.startswith("__")]
        if not kept:
            return F.lit(False)
        by_name = {f.name: f for f in kept}
        names = set(by_name)
        member_live: list[Column] = []
        for f in kept:
            sub = col.getField(f.name)
            partner = (
                _pair_name(f.name, names)
                if isinstance(f.dataType, T.ArrayType)
                else None
            )
            if partner is not None and isinstance(by_name[partner].dataType, T.ArrayType):
                member_live.append(
                    sub.isNotNull()
                    & (
                        _array_live(sub, f.dataType)
                        | _array_live(col.getField(partner), by_name[partner].dataType)
                    )
                )
            else:
                member_live.append(_live(sub, f.dataType))
        return col.isNotNull() & reduce(lambda a, b: a | b, member_live)
    if isinstance(dtype, T.ArrayType):
        return _array_live(col, dtype)
    return col.isNotNull()


def _array_live(col: Column, dtype: T.ArrayType) -> Column:
    """Does this array hold at least one element that survives cleaning?"""
    return col.isNotNull() & F.exists(col, lambda x: _live(x, dtype.elementType))


def _clean(
    col: Column,
    dtype: T.DataType,
    mark: bool = False,
    dec: bool = False,
    spec: dict | None = None,
) -> Column:
    """Strip annotations + null-prune; ``dec`` marks a decimal-kinded
    string position (sentinel-wrap for number regeneration).

    ``spec`` — the registry's expanded element dict for THIS struct
    position (r4_elements.expanded_elements), when the caller knows the
    resource type. Decimal positions then come from the definition
    itself (exact paths: ChargeItem.factorOverride, adjudication.value,
    a Quantity with only ``value`` populated), with the name-based rules
    kept as the fallback for unregistered paths."""
    from parquet_on_fhir_spark.fhir.r4_elements import expanded_elements

    if isinstance(dtype, T.StructType):
        kept = [f for f in dtype.fields if not f.name.startswith("__")]
        if not kept:
            return F.lit(None).cast(T.NullType())
        by_name = {f.name: f for f in kept}
        names = set(by_name)
        qshape = is_quantity_shaped(dtype)
        children: list[Column] = []
        for f in kept:
            ref = spec.get(f.name, (None,))[0] if spec else None
            if ref is not None:
                # the definition types this exact path — trust it and
                # suppress the structural/name fallbacks (a {code,value}
                # backbone like ImplementationGuide.definition.parameter
                # is quantity-SHAPED but its value is a plain string)
                f_dec = mark and isinstance(ref, str) and ref in DECIMAL_TYPES
            else:
                f_dec = mark and (
                    fhir_type_of(f.name) in DECIMAL_TYPES
                    or (qshape and f.name == "value")
                )
            f_spec = expanded_elements(ref) if ref is not None else None
            sub = col.getField(f.name)
            partner = (
                _pair_name(f.name, names)
                if isinstance(f.dataType, T.ArrayType)
                else None
            )
            if partner is not None and isinstance(by_name[partner].dataType, T.ArrayType):
                live = _array_live(col.getField(partner), by_name[partner].dataType)
                child = _clean_array(
                    sub, f.dataType, mark, f_dec, paired_live=live, spec=f_spec
                )
            else:
                child = _clean(sub, f.dataType, mark, f_dec, spec=f_spec)
            children.append(child.alias(f.name))
        rebuilt = F.struct(*children)
        # all-dead check via the liveness predicate — NOT by re-checking
        # the (large) cleaned children expressions for null
        any_live = _live(col, dtype)
        return F.when(col.isNull() | ~any_live, F.lit(None).cast(_clean_type(dtype))).otherwise(
            rebuilt
        )
    if isinstance(dtype, T.ArrayType):
        return _clean_array(col, dtype, mark, dec, paired_live=None, spec=spec)
    if dec and isinstance(dtype, T.StringType):
        return _mark_decimal(col)
    return col


def _clean_array(
    col: Column,
    dtype: T.ArrayType,
    mark: bool,
    dec: bool,
    paired_live: Column | None,
    spec: dict | None = None,
) -> Column:
    """Clean an array. Unpaired: drop null elements, empty → null.
    Paired (``paired_live`` = does the partner array have any live
    element): keep interior nulls for index alignment; drop only when
    this member AND its partner are both dead."""
    cleaned = F.transform(
        col, lambda x: _clean(x, dtype.elementType, mark, dec, spec=spec)
    )
    live = _array_live(col, dtype)
    null_lit = F.lit(None).cast(_clean_type(dtype))
    if paired_live is None:
        non_null = F.filter(cleaned, lambda x: x.isNotNull())
        return F.when(col.isNull() | ~live, null_lit).otherwise(non_null)
    return F.when(col.isNull() | (~live & ~paired_live), null_lit).otherwise(cleaned)


def strip_annotations(
    df: DataFrame,
    _mark_decimals: bool = False,
    resource_type: str | None = None,
) -> DataFrame:
    """Remove ``__*`` fields at every nesting level; null-prune empties
    (paired primitive/_primitive arrays keep interior null placeholders).
    ``_mark_decimals`` is internal (to_fhir_json). ``resource_type``
    enables registry-path-aware decimal marking."""
    from parquet_on_fhir_spark.fhir.r4_elements import expanded_elements

    spec = expanded_elements(resource_type) if resource_type else None
    fields = [f for f in df.schema.fields if not f.name.startswith("__")]
    names = {f.name for f in fields}
    cols = []
    for f in fields:
        ref = spec.get(f.name, (None,))[0] if spec else None
        f_dec = _mark_decimals and (
            (isinstance(ref, str) and ref in DECIMAL_TYPES)
            or fhir_type_of(f.name) in DECIMAL_TYPES
        )
        f_spec = expanded_elements(ref) if ref is not None else None
        cols.append(
            _top_member(df, f, names, _mark_decimals, f_dec, f_spec).alias(f.name)
        )
    return df.select(*cols)


def _top_member(
    df: DataFrame,
    f: T.StructField,
    names: set[str],
    mark: bool,
    dec: bool,
    spec: dict | None = None,
) -> Column:
    col = F.col(f.name)
    if isinstance(f.dataType, T.ArrayType):
        partner = _pair_name(f.name, names)
        if partner is not None:
            pf = df.schema[partner]
            if isinstance(pf.dataType, T.ArrayType):
                live = _array_live(F.col(partner), pf.dataType)
                return _clean_array(
                    col, f.dataType, mark, dec, paired_live=live, spec=spec
                )
    return _clean(col, f.dataType, mark, dec, spec=spec)


def to_fhir_json(
    df: DataFrame, json_col: str = "json", resource_type: str | None = None
) -> DataFrame:
    """One FHIR JSON document (string) per resource row.

    Decimal-kinded strings regenerate as JSON numbers with their lexical
    text preserved: positions are sentinel-marked structurally during the
    rebuild (module docstring), then one regex strips the quoted
    sentinels after serialization. Pass ``resource_type`` so decimal
    positions come from the R4 registry's exact element paths instead of
    name heuristics alone.
    """
    clean = strip_annotations(df, _mark_decimals=True, resource_type=resource_type)
    js = F.to_json(F.struct(*clean.columns))
    # strip  "<NUL-escape>number<NUL-escape>"  →  number
    js = F.regexp_replace(
        js,
        '"\\\\u0000(-?[0-9]+(?:\\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)\\\\u0000"',
        "$1",
    )
    return clean.select(js.alias(json_col))


def write_ndjson(df: DataFrame, path: str) -> None:
    """Decode and write as NDJSON (one resource per line)."""
    to_fhir_json(df).write.mode("overwrite").text(path)
