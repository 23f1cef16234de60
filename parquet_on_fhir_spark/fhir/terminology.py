"""Terminology operations over Parquet-on-FHIR ValueSet / CodeSystem /
ConceptMap tables — the joins clinical analytics runs constantly
("all codes in this value set", "translate local codes to standard").

Everything is DataFrame composition: ValueSets and CodeSystems are
ordinary encoded resource tables (fhir/encode.py), expansion is
explode + union + anti-join, translation is explode + equi-join.
At scale the terminology side is small and broadcasts; the clinical
fact table is never shuffled by these helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _element_fields(df: DataFrame, *path: str) -> set[str]:
    """Field names of the struct at a dotted path (arrays unwrapped);
    empty set when the path itself is absent — Parquet-on-FHIR schemas
    are SPARSE (README.md:15-18), so every optional element may simply
    not exist as a column."""
    dt: T.DataType = df.schema
    for name in path:
        if not isinstance(dt, T.StructType) or name not in dt.fieldNames():
            return set()
        dt = dt[name].dataType
        while isinstance(dt, T.ArrayType):
            dt = dt.elementType
    return set(dt.fieldNames()) if isinstance(dt, T.StructType) else set()


def expand_valueset(valuesets: DataFrame, codesystems: DataFrame | None = None) -> DataFrame:
    """Expand ValueSet.compose into concrete (url, system, code, display)
    membership rows.

    Supported compose features (the enumerable subset):
    - ``include[].concept[]`` — explicitly listed codes;
    - ``include[].system`` WITHOUT concepts — all codes of that system,
      resolved against the ``codesystems`` table's ``concept[]`` list;
    - ``exclude[].concept[]`` — anti-joined out of the result.

    Filters (``include.filter``, hierarchy walks) raise — they need
    CodeSystem relationship closure, out of scope for the flat subset.
    Sparse schemas are honored: absent optional elements (no ValueSet
    populates ``filter``/``exclude``/``display``…) read as empty.
    """
    inc_fields = _element_fields(valuesets, "compose", "include")
    if "filter" in inc_fields:
        has_filter = valuesets.select(
            F.exists(
                F.coalesce(F.col("compose.include"), F.array()),
                lambda inc: F.size(F.coalesce(inc["filter"], F.array())) > 0,
            ).alias("f")
        ).filter(F.col("f"))
        if has_filter.limit(1).count() > 0:
            raise NotImplementedError(
                "ValueSet.compose.include.filter needs relationship closure; "
                "only enumerated concepts / whole-system includes are supported"
            )

    inc = valuesets.select(
        F.col("url"), F.explode("compose.include").alias("i")
    )
    concept_fields = _element_fields(valuesets, "compose", "include", "concept")
    display = (
        F.col("c.display") if "display" in concept_fields else F.lit(None).cast("string")
    )
    if "concept" in inc_fields:
        n_concepts = F.size(F.coalesce(F.col("i.concept"), F.array()))
        listed = inc.filter(n_concepts > 0).select(
            "url",
            F.col("i.system").alias("system"),
            F.explode("i.concept").alias("c"),
        ).select(
            "url", "system", F.col("c.code").alias("code"), display.alias("display")
        )
        whole = inc.filter(n_concepts == 0)
    else:
        listed = None
        whole = inc
    whole = whole.select("url", F.col("i.system").alias("system"))
    if codesystems is not None:
        cs_concept = _element_fields(codesystems, "concept")
        cs_display = (
            F.col("c.display") if "display" in cs_concept else F.lit(None).cast("string")
        )
        cs = codesystems.select(
            F.col("url").alias("system"), F.explode("concept").alias("c")
        ).select("system", F.col("c.code").alias("code"), cs_display.alias("display"))
        whole_rows = whole.join(F.broadcast(cs), "system").select(
            "url", "system", "code", "display"
        )
        listed = whole_rows if listed is None else listed.unionByName(whole_rows)
    if listed is None:
        raise ValueError(
            "ValueSet has whole-system includes but no codesystems table "
            "was supplied to resolve them"
        )

    if "exclude" in _element_fields(valuesets, "compose"):
        exc = valuesets.select(
            F.col("url"),
            F.explode(F.coalesce(F.col("compose.exclude"), F.array())).alias("e"),
        ).select(
            "url",
            F.col("e.system").alias("system"),
            F.explode(F.coalesce(F.col("e.concept"), F.array())).alias("c"),
        ).select("url", "system", F.col("c.code").alias("code"))
        listed = listed.join(
            F.broadcast(exc), ["url", "system", "code"], "left_anti"
        )
    return listed


def translate_codes(
    df: DataFrame,
    conceptmaps: DataFrame,
    system_col: str,
    code_col: str,
    map_url: str | None = None,
) -> DataFrame:
    """Translate (system, code) pairs through ConceptMap
    group[].element[].target[] — adds ``target_system``,
    ``target_code``, ``target_display``, ``equivalence`` (NULL when no
    mapping exists; rows multiply when a code maps to several targets).

    The flattened mapping table broadcasts; the fact table is never
    shuffled. ``map_url`` restricts to one ConceptMap.
    """
    maps = conceptmaps
    if map_url is not None:
        maps = maps.filter(F.col("url") == map_url)
    flat = (
        maps.select(F.explode("group").alias("g"))
        .select(
            F.col("g.source").alias("__src_system"),
            F.col("g.target").alias("target_system"),
            F.explode("g.element").alias("el"),
        )
        .select(
            "__src_system",
            "target_system",
            F.col("el.code").alias("__src_code"),
            F.explode("el.target").alias("tgt"),
        )
        .select(
            "__src_system",
            "__src_code",
            "target_system",
            F.col("tgt.code").alias("target_code"),
            F.col("tgt.display").alias("target_display"),
            F.col("tgt.equivalence").alias("equivalence"),
        )
    )
    return df.join(
        F.broadcast(flat),
        (F.col(system_col) == F.col("__src_system"))
        & (F.col(code_col) == F.col("__src_code")),
        "left",
    ).drop("__src_system", "__src_code")
