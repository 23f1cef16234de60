"""Shared helpers for the query suite.

Oracle-comparison discipline (driver hashes row values order-insensitively
after sorting columns by name — /root/repo/__spark_entry__.py docstring):

- Output columns restricted to STRING / INT / BIGINT / DOUBLE / BOOLEAN.
  Timestamps are rendered with :func:`ts_str` on the Spark side and
  ``strftime`` on the DuckDB side; dates with ``yyyy-MM-dd``.
- Every computed column is aliased identically in Spark and SQL.
- DOUBLE aggregates are rounded (2-6 dp) to absorb floating summation
  order, which legitimately differs between engines and between runs of
  a distributed plan.
- Rankings/limits always order by a unique key suffix so top-k sets are
  deterministic.
- **No oracle output column may be HUGEINT** (PROVEN, r8→r9): DuckDB
  ``sum(<integer>)`` returns HUGEINT, which the driver's normalization
  renders differently from Spark BIGINT (Arrow/pandas fetch widens it
  to float64 → ``"600000.0"`` vs ``"600000"``) while a local
  ``fetchall()`` yields Python ints and hides it.  All 7 round-8
  driver hash-reds — and only them — had a HUGEINT output column.
  Wrap EVERY integer-sum output in ``CAST(... AS BIGINT)``
  (``count(*)``/``min``/``max`` already return BIGINT and are safe).
  Enforced by tools/oracle_lint.py, run inside tools/selfcheck.py /
  tools/verify_window.py and by tests/test_oracle_portability.py over
  the full suite.  NOTE: the r7 diagnosis of those reds as
  transcendental-accumulation noise was wrong for THIS class — keep
  the d4/12-dp convention below for genuine float chains, but an
  integer-typed hash mismatch means oracle typing, not libm.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_on_fhir_spark.api import load_table
from parquet_on_fhir_spark.session import local_rows_df as local_df, utc


@dataclass(frozen=True)
class Q:
    """One SURVEY §2 operator: a Spark implementation and (when the
    semantics are ANSI-SQL-expressible) a DuckDB oracle query."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str] = None  # None → driver records rows-only check


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    utc(spark)
    return load_table(spark, sf_dir, name)


def ts_str(col: Column | str, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """Timestamp → string, matching DuckDB ``strftime(c, '%Y-%m-%d %H:%M:%S')``."""
    return F.date_format(col, fmt)


def d2(col: Column) -> Column:
    """Round-2 for money SUMS only: sums of 2-decimal values are exact
    multiples of 0.01, never near a rounding boundary, so plain round is
    engine-stable."""
    return F.round(col, 2)


def d4(col: Column) -> Column:
    """Round-4 for DIVISIONS/aggregates (avg, stddev, corr, ratios…).

    Adds a 1e-9 epsilon first (mirrored as ``round(x + 1e-9, 4)`` in every
    oracle): exact decimal quotients like avg-of-2 = x.xx5 land precisely
    on the round-half boundary, where Spark (BigDecimal HALF_UP on the
    binary value) and DuckDB (multiply-then-std::round) disagree. The
    epsilon pushes ties strictly above the boundary in both engines; it is
    ~10× larger than double noise at these magnitudes and 5000× smaller
    than the rounding step.
    
    Signed zero: DuckDB's round preserves the sign of a tiny negative
    (round(-5e-05 + 1e-9, 4) = -0.0) while Spark's yields +0.0, and the
    hash normalization distinguishes them.  Oracles whose rounded value
    can land in (-1e-4, 0) must append ``+ 0.0`` after the round (IEEE
    addition collapses -0.0 to +0.0) — see Q162_ORACLE.

    TRANSCENDENTAL SUMS: the 1e-9 nudge is sized for SINGLE-step
    noise (a quotient, a moment). Any oracle that SUMS transcendental
    terms (exp/ln/log₂/log₁₀ per row or per group, then Σ) must
    quantize EACH term to 12 dp in both engines before the sum —
    ``round(ln(x), 12)`` in SQL, ``term_dp=12`` on the operator.
    Per-term libm error (~1 ulp, engine-build-dependent) summed over
    thousands of terms can exceed the nudge near a 4-dp boundary;
    per-term quantization pins every term to an identical double in
    any engine so chain error never accumulates. Precedents: q145
    keep rates; r8 fixes for q168 (Σ ln(1−d/n)), q173 (regr over ln),
    q192 (Σ c·ln c). Integer-restatable chains should instead go all
    the way to exact integers (q169 AUC: doubled ranks in
    DECIMAL(38,0), one final division).

    Audit of the remaining ln/exp oracles (r8): q179 PMI and q199
    Laplace apply ONE ln per output row — no accumulation, nudge
    covers the single-term ulp. q121 LM score sums per document —
    bounded by doc length (≤ ~10³ terms of magnitude ~15 ⇒ chain
    error ≲ 1e-12 < nudge). q161 KL/JSD sums vocab-sized but each
    term is probability-scale (pa·ln(pa/pb) ~ 1e-5·ln ⇒ per-term
    absolute error ~1e-20, 1e5-term chain ≲ 1e-15). The r8 window's
    new entries were checked too: q214 MI/entropy sums run over a ≤6-
    cell contingency table and are divided by n (≲1e-14); q211/q213
    are rational-only. None needs per-term quantization; re-audit any
    NEW oracle whose summed term magnitude × term count approaches
    1e-9.
    """
    return F.round(col + F.lit(1e-9), 4)
