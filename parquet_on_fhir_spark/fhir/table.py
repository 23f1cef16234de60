"""Typed query API over Parquet-on-FHIR tables (SURVEY.md §3 Path B):
helpers that compile to Column expressions — never bypassing Catalyst.

    pt = FhirTable.read(spark, "/data/Patient")          # or .from_df(df)
    pt.where_date("birthDate", "ge", "1960")             # annotation rewrite
      .flatten("name")                                    # explode nested list
      .df.select("id", "name.family")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_on_fhir_spark.fhir.annotations import annotate
from parquet_on_fhir_spark.plans.rewrite import (
    date_predicate,
    decimal_predicate,
    quantity_predicate,
)


class FhirTable:
    """A resource table plus the spec's query affordances."""

    def __init__(self, df: DataFrame):
        self.df = df

    # --- construction -------------------------------------------------
    @classmethod
    def read(cls, spark: SparkSession, path: str, merge_schema: bool = True) -> "FhirTable":
        reader = spark.read.option("mergeSchema", str(merge_schema).lower())
        return cls(reader.parquet(path))

    @classmethod
    def from_df(cls, df: DataFrame) -> "FhirTable":
        return cls(df)

    def ensure_annotations(self) -> "FhirTable":
        return FhirTable(annotate(self.df))

    # --- annotation-aware predicates (SURVEY.md §4.1) ------------------
    def where_date(self, element: str, op: str, value: str) -> "FhirTable":
        t = self if f"__{element}_start" in self.df.columns else self.ensure_annotations()
        return FhirTable(t.df.filter(date_predicate(element, op, value)))

    def where_decimal(self, element: str, op: str, value) -> "FhirTable":
        t = self if f"__{element}_numeric" in self.df.columns else self.ensure_annotations()
        return FhirTable(t.df.filter(decimal_predicate(element, op, value)))

    def where_quantity(self, element: str, op: str, value: float, unit: str) -> "FhirTable":
        t = (
            self
            if f"__{element}_canonical" in self.df.columns
            else self.ensure_annotations()
        )
        return FhirTable(t.df.filter(quantity_predicate(element, op, value, unit)))

    # --- FHIR-search-style string front-end ------------------------------
    def search(self, params: str) -> "FhirTable":
        """Filter with FHIR-search-flavored syntax, e.g.
        ``"birthDate=ge1960&gender=male&valueQuantity=gt37.5|Cel"``.

        Per parameter: ``<element>=[prefix]<value>[|unit]`` with FHIR
        prefixes (eq/ne/gt/lt/ge/le; bare value = eq). Routing:
        value with a ``|unit`` → quantity predicate; numeric value on a
        decimal-kinded element → decimal predicate; date-shaped value →
        date predicate; otherwise string equality. Compiles entirely to
        the annotation-aware Column predicates above.
        """
        import re

        from parquet_on_fhir_spark.fhir.types import DECIMAL_TYPES, fhir_type_of

        out = self
        for clause in params.split("&"):
            if not clause.strip():
                continue
            element, _, raw = clause.partition("=")
            element = element.strip()
            m = re.match(r"^(eq|ne|gt|lt|ge|le)", raw)
            op = m.group(1) if m else "eq"
            value = raw[len(op):] if m else raw
            value, _, unit = value.partition("|")
            if unit:
                out = out.where_quantity(element, op, float(value), unit)
            elif re.match(r"^\d{4}(-\d{2}(-\d{2})?)?([T ].*)?$", value):
                out = out.where_date(element, op, value)
            elif fhir_type_of(element) in DECIMAL_TYPES or re.match(
                r"^-?\d+(\.\d+)?$", value
            ):
                out = out.where_decimal(element, op, value)
            else:
                col = F.col(element)
                out = FhirTable(
                    out.df.filter(col != value if op == "ne" else col == value)
                )
        return out

    # --- nested navigation ---------------------------------------------
    def flatten(self, path: str, keep: str = "inner") -> "FhirTable":
        """Explode a repeating element; the exploded struct keeps the
        element's name so nested field references read naturally
        (``flatten('name') → col('name.family')``)."""
        explode = F.explode_outer if keep == "outer" else F.explode
        other = [c for c in self.df.columns if c != path]
        return FhirTable(self.df.select(*other, explode(path).alias(path)))

    def count(self) -> int:
        return self.df.count()
