"""Oracle-portability lint: static type checks over every DuckDB oracle.

Root cause proven in round 8 (VERDICT r8 "What's wrong"): the driver's
normalization renders DuckDB HUGEINT differently from Spark BIGINT (the
classic channel is an Arrow/pandas fetch where HUGEINT widens to float64,
so 600000 renders "600000.0" vs Spark's "600000"), while a local
``fetchall()`` yields Python ints and hides the divergence.  DuckDB's
``sum(<integer>)`` returns HUGEINT, so every oracle must wrap integer
sums in ``CAST(... AS BIGINT)``.  7/7 round-8 hash-reds had a HUGEINT
output column; 0/231 lifetime greens did.

This module binds each oracle (no execution — DuckDB relations resolve
output types at bind time) and reports:

- BANNED types that the driver normalization is known/likely to render
  differently from any Spark type: HUGEINT / UHUGEINT, plus TIMESTAMP/
  DATE/interval leaking through un-stringified (the suite convention
  renders temporals as strings — suite/common.py module docstring).
- With a Spark schema available (selfcheck wires it in), category
  divergences: integer-vs-float, decimal-vs-float, integer-vs-decimal
  column type disagreements between the oracle and the Spark result.
  These render "5" vs "5.0" (or "0.5000" vs "0.5") under the driver's
  per-cell normalization even when the values are equal.

Used by tools/selfcheck.py (and therefore tools/verify_window.py) on
every oracle run, and by tests/test_oracle_portability.py over the full
declared suite so the class can never ship again.
"""

from __future__ import annotations

import re

BANNED_DUCK = {"HUGEINT", "UHUGEINT"}

_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLOAT = {"FLOAT", "DOUBLE", "REAL"}
_SPARK_INT = {"tinyint", "smallint", "int", "bigint", "long", "integer",
              "short", "byte"}
_SPARK_FLOAT = {"float", "double"}


def duck_category(t: str) -> str:
    u = str(t).upper()
    if u in _DUCK_INT:
        return "int"
    if u in _DUCK_FLOAT:
        return "float"
    if u.startswith("DECIMAL") or u in BANNED_DUCK:
        return "decimal"
    if u == "BOOLEAN":
        return "bool"
    if u in ("VARCHAR", "STRING"):
        return "str"
    return "other"


def spark_category(t: str) -> str:
    u = str(t).lower()
    if u in _SPARK_INT:
        return "int"
    if u in _SPARK_FLOAT:
        return "float"
    if u.startswith("decimal"):
        return "decimal"
    if u == "boolean":
        return "bool"
    if u == "string":
        return "str"
    return "other"


def lint_oracle_types(con, oracle: str) -> list[str]:
    """Bind ``oracle`` on ``con`` (views must exist) and return a list of
    problem strings — empty means portable.  Never executes the query."""
    rel = con.sql(oracle)
    problems = []
    for col, typ in zip(rel.columns, rel.types):
        u = str(typ).upper()
        base = re.split(r"[(\s]", u, 1)[0]
        if base in BANNED_DUCK:
            problems.append(
                f"oracle column `{col}` is {u} (DuckDB sum(<integer>)?) — "
                f"wrap in CAST(... AS BIGINT); HUGEINT is driver-red "
                f"(VERDICT r8)"
            )
        elif base == "DECIMAL":
            # Round-10 red class (VERDICT r10 "What's wrong" 1): DECIMAL
            # *output* columns degrade to float64 through the driver's
            # Arrow/pandas fetch (223183329690674.7423 -> ...674.75;
            # "1524135.0" vs Spark Decimal "1524135.0000").  Internal
            # decimal arithmetic is fine — the final projection must
            # render as VARCHAR (fixed-scale decimal->string is
            # identical in Spark and DuckDB) or fit a BIGINT/DOUBLE.
            problems.append(
                f"oracle column `{col}` is {u} — DECIMAL output columns "
                f"are driver-red (VERDICT r10); project as "
                f"CAST(... AS VARCHAR) on both sides"
            )
        elif base in ("TIMESTAMP", "TIMESTAMPTZ", "DATE", "TIME", "INTERVAL"):
            problems.append(
                f"oracle column `{col}` is {u} — render temporals as "
                f"strings (strftime / ts_str), suite convention"
            )
    return problems


def lint_type_divergence(
    con, oracle: str, spark_dtypes: list[tuple[str, str]]
) -> list[str]:
    """Given the Spark result's ``df.dtypes``, flag per-column category
    disagreements (matched by column name) that the driver's per-cell
    normalization renders differently even for equal values."""
    rel = con.sql(oracle)
    duck = {c: duck_category(t) for c, t in zip(rel.columns, rel.types)}
    problems = []
    for col, styp in spark_dtypes:
        if col not in duck:
            continue  # column-set mismatch reported elsewhere
        sc, dc = spark_category(styp), duck[col]
        if sc == dc:
            continue
        # int/float/decimal cross-category renders diverge ("5" vs "5.0"
        # vs Decimal("5.00")); bool-vs-int also diverges under str().
        numeric = {"int", "float", "decimal", "bool"}
        if sc in numeric and dc in numeric:
            problems.append(
                f"type divergence on `{col}`: spark={styp} vs duck-"
                f"category={dc} — align (CAST the oracle or the Spark col)"
            )
    return problems
