"""FHIR partial date/dateTime → [start, end] instant bounds.

Reimplements the date-range annotation semantics of the reference spec
(/root/reference/README.md:314-341): a partial FHIR date such as
``2014-06`` denotes the whole range it covers; ``__x_start``/``__x_end``
are the earliest/latest instants included. Spec anchor example
(README.md:325-327): ``2014-06-01T12:05Z`` → start
``2014-06-01T12:05:00.000Z``, end ``2014-06-01T12:05:59.999Z``.

Everything is a pure Catalyst expression (no UDF): these run at encode
time over billions of rows, and also power the annotation-aware
predicate rewrite, so they must stay inside whole-stage codegen.

FHIR lexical forms handled (https://hl7.org/fhir/datatypes.html):
``YYYY``, ``YYYY-MM``, ``YYYY-MM-DD``, and
``YYYY-MM-DDThh:mm(:ss(.sss)?)?(Z|±hh:mm)`` (timezone required by FHIR
whenever a time is present; millisecond resolution per the spec's
TIMESTAMP(MILLIS) annotation type, README.md:329-330).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_TZ_RE = r"(Z|[+-]\d{2}:\d{2})$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _time_parts(s: Column):
    """Split a time-bearing FHIR dateTime into (date, time-body, tz)."""
    tz = F.regexp_extract(s, _TZ_RE, 1)
    body = F.regexp_replace(s, _TZ_RE, "")
    date_part = F.split(body, "T")[0]
    time_part = F.split(body, "T")[1]
    return date_part, time_part, tz


def _pad_time(time_part: Column, fill: str) -> Column:
    """Normalize a partial time to hh:mm:ss.SSS, padding the unspecified
    tail with ``fill`` ('0' → earliest instant, '9' → latest)."""
    ncolon = F.length(time_part) - F.length(F.regexp_replace(time_part, ":", ""))
    has_frac = time_part.contains(".")
    frac = F.split(time_part, r"\.")[1]
    base = F.split(time_part, r"\.")[0]
    frac3 = F.rpad(F.substring(frac, 1, 3), 3, fill)
    sec = "00" if fill == "0" else "59"
    ms = fill * 3
    return (
        F.when(ncolon == 1, F.concat(time_part, F.lit(f":{sec}.{ms}")))
        .when(~has_frac, F.concat(time_part, F.lit(f".{ms}")))
        .otherwise(F.concat(base, F.lit("."), frac3))
    )


def _bound(c: Column | str, fill: str) -> Column:
    s = F.trim(_col(c).cast("string"))
    n = F.length(s)
    has_time = s.contains("T")

    if fill == "0":
        y_suffix, m_day, d_time = "-01-01T00:00:00.000Z", "-01", "T00:00:00.000Z"
    else:
        y_suffix, m_day, d_time = "-12-31T23:59:59.999Z", None, "T23:59:59.999Z"

    date_part, time_part, tz = _time_parts(s)
    timed = F.concat(date_part, F.lit("T"), _pad_time(time_part, fill), tz)

    month_start = F.concat(s, F.lit("-01T00:00:00.000Z"))
    # try_to_date: the length-7 branch admits ANY 7-char string
    # ('garbage', '2015-13'); a plain to_date would throw under ANSI
    # instead of yielding the contracted NULL bounds
    month_end = F.concat(
        F.date_format(
            F.last_day(F.try_to_date(F.concat(s, F.lit("-01")))), "yyyy-MM-dd"
        ),
        F.lit("T23:59:59.999Z"),
    )

    iso = (
        F.when(has_time, timed)
        .when(n == 4, F.concat(s, F.lit(y_suffix)))
        .when(n == 7, month_start if fill == "0" else month_end)
        .when(n == 10, F.concat(s, F.lit(d_time)))
        .otherwise(F.lit(None))
    )
    # try_to_timestamp: malformed lexical forms yield NULL bounds instead
    # of failing the encode job under ANSI mode.  Instants in the first
    # days of year 0001 sit below Spark's Julian-rebase floor and raise
    # "year 0 is out of range" even under try_ — NULL them explicitly
    # (the ±14:00 FHIR offset range can shift 0001-01-03/04 under the
    # floor too, so the guard covers 0001-01-01 through -09).
    iso = F.when(iso.rlike("^0001-01-0"), F.lit(None)).otherwise(iso)
    return F.try_to_timestamp(iso)


def fhir_date_start(c: Column | str) -> Column:
    """Earliest instant included in a (possibly partial) FHIR date value
    (README.md:314-330); UTC, millisecond resolution."""
    return _bound(c, "0")


def fhir_date_end(c: Column | str) -> Column:
    """Latest instant included in a (possibly partial) FHIR date value
    (README.md:314-330); UTC, millisecond resolution."""
    return _bound(c, "9")
