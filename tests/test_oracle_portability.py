"""Static portability lint over EVERY declared oracle (VERDICT r8 task 2).

Round-8 proof: all 7 driver hash-reds — and only them — had a DuckDB
HUGEINT output column (``sum(<integer>)`` returns HUGEINT; the driver's
normalization renders it differently from Spark BIGINT, while a local
``fetchall()`` yields Python ints and hides it).  This test binds every
oracle (no execution, bind-time type resolution only — no Spark needed)
and fails if any output column is HUGEINT/UHUGEINT or a raw temporal,
so the class can never reach a driver run again.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parquet_on_fhir_spark.api import TABLES
from parquet_on_fhir_spark.suite import all_queries
from tools.oracle_lint import lint_oracle_types

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_banned_oracle_types(con):
    bad = {}
    for q in all_queries():
        if q.oracle is None:
            continue
        problems = lint_oracle_types(con, q.oracle)
        if problems:
            bad[q.name] = problems
    assert not bad, (
        "oracle portability lint failed (CAST integer sums to BIGINT; "
        "render temporals as strings):\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(bad.items()))
    )


def test_known_red_class_is_fixed(con):
    """The 7 round-8 reds specifically must bind HUGEINT-free now."""
    fixed = {
        "q168_kaplan_meier",
        "q169_binary_auc",
        "q173_zipf_slope",
        "q192_unigram_entropy",
        "q200_k_anonymity",
        "q204_cross_source_dup_audit",
        "q211_nelson_aalen",
    }
    seen = set()
    for q in all_queries():
        if q.name in fixed:
            seen.add(q.name)
            assert lint_oracle_types(con, q.oracle) == [], q.name
    assert seen == fixed


def test_decimal_output_class_fires(con):
    """Round-10 red class regression (VERDICT r10 task 2): the lint must
    fire on the UNFIXED q210b shape — a DECIMAL(38,4) output column —
    which degraded to float64 in the driver's fetch
    (223183329690674.7423 -> ...674.75) while fetchall() hid it."""
    unfixed = (
        "SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) "
        "AS DECIMAL(38,4)) AS s_q FROM lineitem"
    )
    problems = lint_oracle_types(con, unfixed)
    assert problems and "DECIMAL" in problems[0] and "VARCHAR" in problems[0]
    # the fixed projection (VARCHAR both sides) is clean
    fixed = (
        "SELECT CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) "
        "AS DECIMAL(38,4)) AS VARCHAR) AS s_q FROM lineitem"
    )
    assert lint_oracle_types(con, fixed) == []
