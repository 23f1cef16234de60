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


def _all_concepts(codesystems: DataFrame) -> DataFrame:
    """(system, code, display) at EVERY ``concept`` nesting depth of the
    encoded CodeSystem table — R4 represents is-a hierarchy as nested
    ``concept[].concept[]`` (hl7.org/fhir/R4/codesystem.html), so a
    whole-system include must collect the nested levels too. The walk
    is unrolled statically over the encoded schema's finite depth
    (sparse schemas nest exactly as deep as the data does)."""
    has_display = "display" in _element_fields(codesystems, "concept")

    def pick(c):
        return (
            F.col("c.display") if has_display else F.lit(None).cast("string")
        )

    cur = codesystems.select(
        F.col("url").alias("system"), F.explode("concept").alias("c")
    )
    out = cur.select(
        "system", F.col("c.code").alias("code"), pick("c").alias("display")
    )
    while isinstance(
        cur.schema["c"].dataType, T.StructType
    ) and "concept" in cur.schema["c"].dataType.fieldNames():
        cur = cur.select(
            "system",
            F.explode(F.coalesce(F.col("c.concept"), F.array())).alias("c"),
        )
        out = out.unionByName(
            cur.select(
                "system",
                F.col("c.code").alias("code"),
                pick("c").alias("display"),
            )
        )
    return out


def concept_edges(codesystems: DataFrame) -> DataFrame:
    """(system, parent, child) direct is-a edges from CodeSystem
    ``concept`` nesting, statically unrolled over the schema depth —
    map-side explodes only, no shuffle."""
    cur = codesystems.select(
        F.col("url").alias("system"), F.explode("concept").alias("c")
    )
    edges = None
    while isinstance(
        cur.schema["c"].dataType, T.StructType
    ) and "concept" in cur.schema["c"].dataType.fieldNames():
        nxt = cur.select(
            "system",
            F.col("c.code").alias("parent"),
            F.explode(F.coalesce(F.col("c.concept"), F.array())).alias("c"),
        )
        lvl = nxt.select("system", "parent", F.col("c.code").alias("child"))
        edges = lvl if edges is None else edges.unionByName(lvl)
        cur = nxt.select("system", "c")
    if edges is None:
        return codesystems.sparkSession.createDataFrame(
            [], "system string, parent string, child string"
        )
    return edges


def concept_closure(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Transitive closure (system, ancestor, descendant) of is-a edges
    by PATH DOUBLING: each round joins the closure with itself, so
    depth-d hierarchies converge in ceil(log2 d) rounds — 5 rounds
    cover depth 32 (SNOMED-class hierarchies are ~15 deep). Each round
    is one self-join + distinct on (system, code) keys; lineage is cut
    per round (localCheckpoint) and convergence is witnessed by the
    non-decreasing row count reaching a fixpoint. Non-reflexive
    (a code is not its own descendant here; ``is-a`` filters add the
    anchor code back explicitly). Raises on non-convergence rather
    than silently under-closing — same contract as
    operators/graph.py::connected_components.
    """
    from parquet_on_fhir_spark.operators.graph import _truncate_lineage

    clo = _truncate_lineage(
        edges.select(
            "system",
            F.col("parent").alias("ancestor"),
            F.col("child").alias("descendant"),
        ).distinct()
    )
    n = clo.count()
    for _ in range(max_rounds):
        hop = clo.select(
            F.col("system").alias("h_system"),
            F.col("ancestor").alias("h_anc"),
            F.col("descendant").alias("h_desc"),
        )
        grown = (
            clo.join(
                hop,
                (F.col("system") == F.col("h_system"))
                & (F.col("descendant") == F.col("h_anc")),
            )
            .select("system", "ancestor", F.col("h_desc").alias("descendant"))
            .unionByName(clo)
            .distinct()
        )
        grown = _truncate_lineage(grown)
        m = grown.count()
        if m == n:
            return grown
        clo, n = grown, m
    raise RuntimeError(
        f"concept closure did not converge in {max_rounds} doubling rounds "
        f"(hierarchy deeper than 2^{max_rounds}? cyclic is-a edges?)"
    )


def expand_valueset(
    valuesets: DataFrame,
    codesystems: DataFrame | None = None,
    closure: DataFrame | None = None,
) -> DataFrame:
    """Expand ValueSet.compose into concrete (url, system, code, display)
    membership rows.

    Supported compose features:
    - ``include[].concept[]`` — explicitly listed codes;
    - ``include[].system`` WITHOUT concepts — all codes of that system
      (every nesting depth), resolved against the ``codesystems`` table;
    - ``include[].filter[]`` with ``property='concept'`` and op
      ``is-a`` (anchor + transitive descendants) or ``descendent-of``
      (descendants only), resolved against ``closure`` (build it with
      :func:`concept_closure` over :func:`concept_edges`); other
      properties/ops raise;
    - ``exclude[].concept[]`` — anti-joined out of the result.

    Sparse schemas are honored: absent optional elements (no ValueSet
    populates ``filter``/``exclude``/``display``…) read as empty.
    """
    inc_fields = _element_fields(valuesets, "compose", "include")
    filtered = None
    if "filter" in inc_fields:
        has_filter = valuesets.select(
            F.exists(
                F.coalesce(F.col("compose.include"), F.array()),
                lambda inc: F.size(F.coalesce(inc["filter"], F.array())) > 0,
            ).alias("f")
        ).filter(F.col("f"))
        if has_filter.limit(1).count() > 0:
            if closure is None:
                raise NotImplementedError(
                    "ValueSet.compose.include.filter needs a concept "
                    "closure — build one with concept_closure("
                    "concept_edges(codesystems)) and pass closure="
                )
            filtered = _expand_filters(valuesets, codesystems, closure)

    inc = valuesets.select(
        F.col("url"), F.explode("compose.include").alias("i")
    )
    concept_fields = _element_fields(valuesets, "compose", "include", "concept")
    display = (
        F.col("c.display") if "display" in concept_fields else F.lit(None).cast("string")
    )
    n_filters = (
        F.size(F.coalesce(F.col("i.filter"), F.array()))
        if "filter" in inc_fields
        else F.lit(0)
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
        whole = inc.filter((n_concepts == 0) & (n_filters == 0))
    else:
        listed = None
        whole = inc.filter(n_filters == 0)
    whole = whole.select("url", F.col("i.system").alias("system"))
    if codesystems is not None:
        whole_rows = whole.join(F.broadcast(_all_concepts(codesystems)), "system").select(
            "url", "system", "code", "display"
        )
        listed = whole_rows if listed is None else listed.unionByName(whole_rows)
    if filtered is not None:
        listed = filtered if listed is None else listed.unionByName(filtered)
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


def _expand_filters(
    valuesets: DataFrame, codesystems: DataFrame | None, closure: DataFrame
) -> DataFrame:
    """Resolve ``include.filter`` entries against a concept closure:
    ``is-a`` = anchor + transitive descendants, ``descendent-of`` =
    descendants only (hl7.org/fhir/R4/valueset.html#compose). The
    closure and the filter list are both terminology-sized —
    broadcast; anything else raises at plan time."""
    flt = (
        valuesets.select(F.col("url"), F.explode("compose.include").alias("i"))
        .select(
            "url",
            F.col("i.system").alias("system"),
            F.explode(F.coalesce(F.col("i.filter"), F.array())).alias("f"),
        )
        .select(
            "url",
            "system",
            F.col("f.property").alias("property"),
            F.col("f.op").alias("op"),
            F.col("f.value").alias("value"),
        )
    )
    bad = (
        flt.filter(
            ~(
                (F.col("property") == "concept")
                & F.col("op").isin("is-a", "descendent-of")
            )
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise NotImplementedError(
            f"unsupported ValueSet filter: property={bad[0]['property']!r} "
            f"op={bad[0]['op']!r} (supported: concept is-a / descendent-of)"
        )
    clo = closure.select(
        F.col("system").alias("c_system"),
        F.col("ancestor").alias("c_anc"),
        F.col("descendant").alias("c_desc"),
    )
    descendants = flt.join(
        F.broadcast(clo),
        (F.col("system") == F.col("c_system")) & (F.col("value") == F.col("c_anc")),
    ).select("url", "system", F.col("c_desc").alias("code"))
    anchors = flt.filter(F.col("op") == "is-a").select(
        "url", "system", F.col("value").alias("code")
    )
    members = descendants.unionByName(anchors).distinct()
    if codesystems is not None:
        disp = _all_concepts(codesystems).withColumnRenamed("system", "d_system")
        return members.join(
            F.broadcast(disp),
            (F.col("system") == F.col("d_system")) & (members["code"] == disp["code"]),
            "left",
        ).select("url", "system", members["code"].alias("code"), "display")
    return members.withColumn("display", F.lit(None).cast("string"))


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
