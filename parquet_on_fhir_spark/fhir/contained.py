"""Contained resources (hl7.org/fhir/R4/references.html#contained).

``DomainResource.contained`` holds inline resources of arbitrary type,
referenced from the host via local ``#<id>`` references. The format side
needs no special code path: the sparse derived schema represents
``contained`` as an array of the merged struct of whatever contained
types the data set exhibits (exactly the spec's sparse-union behavior
for any repeating element), annotations/decimal rules apply inside it
through the same structural walk, and decode null-prunes each element
back to its own sparse shape — round-trip is lossless
(tests/test_fhir_format.py::test_contained_resources_roundtrip).

This module adds the two *query* affordances users need on top:

- :func:`extract_contained` — promote contained resources of one type to
  standalone rows (explode: a generator, no shuffle; the resourceType
  filter runs pre-explode via ``F.filter`` so non-matching elements are
  never generated).
- :func:`resolve_local_reference` — materialize the target of a
  ``#id``-valued Reference element as a sibling column. Contained
  resources live in the SAME row as the referencing element, so this is
  a pure expression (array lookup), not a join — zero shuffle at any
  scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _contained_field(df: DataFrame) -> T.ArrayType:
    dt = df.schema["contained"].dataType
    if not (
        isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType)
    ):
        raise ValueError(f"contained is not array<struct>: {dt}")
    return dt


def extract_contained(
    df: DataFrame,
    resource_type: str | None = None,
    parent_id_col: str = "_parent_id",
) -> DataFrame:
    """One row per contained resource (optionally one resourceType only),
    flattened to top-level columns, with the host resource's ``id``
    carried as ``parent_id_col``.

    Plan shape: filter-inside-the-array (``F.filter``, evaluated before
    the generator) → ``explode`` → struct flatten. Map-side only; the
    output partitioning is the input's.
    """
    _contained_field(df)
    arr = F.col("contained")
    if resource_type is not None:
        arr = F.filter(arr, lambda x: x["resourceType"] == F.lit(resource_type))
    ex = df.select(
        F.col("id").alias(parent_id_col), F.explode(arr).alias("__c")
    )
    return ex.select(parent_id_col, "__c.*")


def local_reference_target(df: DataFrame, reference_col: str | Column) -> Column:
    """Expression: the contained element whose ``id`` matches a local
    ``#<id>`` reference string in this row (NULL when the reference is
    absent, not local, or dangling)."""
    ref = (
        F.col(reference_col) if isinstance(reference_col, str) else reference_col
    )
    hit = F.filter(
        F.col("contained"),
        lambda x: F.concat(F.lit("#"), x["id"]) == ref,
    )
    return F.when(
        ref.startswith("#") & (F.size(hit) > 0), hit.getItem(0)
    ).otherwise(F.lit(None))


def resolve_local_reference(
    df: DataFrame, element: str, out_col: str | None = None
) -> DataFrame:
    """Add ``out_col`` (default ``<element>_resolved``) holding the
    contained resource targeted by ``<element>.reference`` when that
    reference is local (``#id``); NULL otherwise.

    Same-row array lookup — a map-only projection, never a join. (For
    non-local references use the reference-join path instead:
    suite/fhir_queries.py::qf07.)
    """
    out = out_col or f"{element}_resolved"
    return df.withColumn(
        out, local_reference_target(df, f"{element}.reference")
    )
