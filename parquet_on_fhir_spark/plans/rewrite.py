"""Annotation-aware predicate rewrite (SURVEY.md §4.1).

The format stores dates/decimals as lossless STRINGS; string comparisons
neither push down usefully to Parquet nor use row-group min/max stats.
The standard annotations exist precisely to fix this ("useful for
querying the data", README.md:301-303): these builders compile a
user-level predicate on a FHIR element into a condition on its
``__x_start``/``__x_end`` (TIMESTAMP), ``__x_numeric`` (DECIMAL), or
``__x_canonical`` (UCUM) columns — all of which Spark pushes into the
scan and skips row groups with.

Date semantics follow FHIR search prefixes over the element's covered
interval [start, end] vs the query value's interval [v_start, v_end]
(partial dates on both sides):

  eq: element interval contained in value interval
  ne: not eq
  gt: element ends after the value interval      (x_end  >  v_end)
  lt: element starts before the value interval   (x_start <  v_start)
  ge: gt ∪ overlap-or-after                      (x_end  >= v_start)
  le: lt ∪ overlap-or-before                     (x_start <= v_end)

This is the API-layer (v1) form from SURVEY.md §4.1; an injected
Catalyst rule (spark.sql.extensions) would need a Scala artifact and is
noted as the v2 polish.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from parquet_on_fhir_spark.fhir.ucum import UCUM_CANONICAL
from parquet_on_fhir_spark.functions.partial_date import fhir_date_end, fhir_date_start


def date_predicate(element: str, op: str, value: str) -> Column:
    """Predicate on a FHIR date/dateTime ``element`` rewritten onto its
    ``__<element>_start`` / ``__<element>_end`` annotation columns.

    ``value`` may be partial (``'2022'``, ``'2022-03'``, full dateTime).
    """
    x_start = F.col(f"__{element}_start")
    x_end = F.col(f"__{element}_end")
    v_start = fhir_date_start(F.lit(value))
    v_end = fhir_date_end(F.lit(value))
    if op == "eq":
        return (x_start >= v_start) & (x_end <= v_end)
    if op == "ne":
        return ~((x_start >= v_start) & (x_end <= v_end))
    if op == "gt":
        return x_end > v_end
    if op == "lt":
        return x_start < v_start
    if op == "ge":
        return x_end >= v_start
    if op == "le":
        return x_start <= v_end
    raise ValueError(f"unknown date op: {op}")


_OPS = {
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "lt": lambda c, v: c < v,
    "ge": lambda c, v: c >= v,
    "le": lambda c, v: c <= v,
}


def decimal_predicate(element: str, op: str, value: float | str) -> Column:
    """Predicate on a FHIR decimal ``element`` rewritten onto its
    ``__<element>_numeric`` DECIMAL(38,6) annotation column."""
    c = F.col(f"__{element}_numeric")
    v = F.lit(str(value)).try_cast("decimal(38,6)")
    return _OPS[op](c, v)


def quantity_predicate(element: str, op: str, value: float, unit: str) -> Column:
    """Predicate on a FHIR Quantity ``element`` rewritten onto its
    ``__<element>_canonical`` annotation (README.md:365-373): the query
    literal is canonicalized with the same UCUM table at plan time, so
    e.g. ``('gt', 98.6, '[degF]')`` matches Celsius-coded rows."""
    target, factor, offset = UCUM_CANONICAL.get(unit, (unit, 1.0, 0.0))
    canon_value = value * factor + offset
    c = F.col(f"__{element}_canonical")
    return (c.getField("code") == target) & _OPS[op](
        c.getField("value"), F.lit(canon_value).try_cast("decimal(38,6)")
    )
