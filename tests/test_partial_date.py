"""Property-based tests for FHIR partial-date bounds (SURVEY.md §5.4;
spec semantics README.md:314-341)."""

from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from parquet_on_fhir_spark.functions.partial_date import fhir_date_end, fhir_date_start


def _bounds(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s string").select(
        "s",
        fhir_date_start("s").alias("start"),
        fhir_date_end("s").alias("end"),
    )
    return {r.s: (r.start, r.end) for r in df.collect()}


years = st.integers(1900, 2100)
months = st.integers(1, 12)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(years, months, st.integers(0, 2)), min_size=1, max_size=8))
def test_start_le_end_and_cover(spark, parts):
    values = []
    for y, m, precision in parts:
        if precision == 0:
            values.append(f"{y:04d}")
        elif precision == 1:
            values.append(f"{y:04d}-{m:02d}")
        else:
            day = min(28, m + 10)
            values.append(f"{y:04d}-{m:02d}-{day:02d}")
    got = _bounds(spark, values)
    for v, (start, end) in got.items():
        assert start is not None and end is not None, v
        assert start <= end, v
        assert start.year == int(v[:4]) and end.year == int(v[:4]), v
        if len(v) >= 7:
            assert start.month == int(v[5:7]) and end.month == int(v[5:7]), v
        if len(v) == 10:
            assert start.day == end.day == int(v[8:10]), v
        assert (start.hour, start.minute, start.second) == (0, 0, 0)
        assert (end.hour, end.minute, end.second) == (23, 59, 59)
        assert end.microsecond == 999000  # millisecond resolution per spec


def test_month_end_handles_lengths_and_leap(spark):
    got = _bounds(spark, ["2024-02", "2023-02", "2024-04", "2024-12"])
    assert got["2024-02"][1].day == 29  # leap year
    assert got["2023-02"][1].day == 28
    assert got["2024-04"][1].day == 30
    assert got["2024-12"][1].day == 31


def test_timezone_and_precision_forms(spark):
    got = _bounds(
        spark,
        [
            "2014-06-01T12:05Z",           # spec anchor (README.md:325-327)
            "2014-06-01T12:05:30Z",
            "2014-06-01T12:05:30.1Z",
            "2014-06-01T12:05:30.123Z",
            "2014-06-01T12:05+10:00",
        ],
    )
    s, e = got["2014-06-01T12:05Z"]
    assert str(s) == "2014-06-01 12:05:00" and str(e) == "2014-06-01 12:05:59.999000"
    s, e = got["2014-06-01T12:05:30Z"]
    assert str(s) == "2014-06-01 12:05:30" and str(e) == "2014-06-01 12:05:30.999000"
    s, e = got["2014-06-01T12:05:30.1Z"]
    assert str(s) == "2014-06-01 12:05:30.100000" and str(e) == "2014-06-01 12:05:30.199000"
    s, e = got["2014-06-01T12:05:30.123Z"]
    assert s == e
    # offset normalizes to UTC (isAdjustedToUTC=true, README.md:329-330)
    s, e = got["2014-06-01T12:05+10:00"]
    assert str(s) == "2014-06-01 02:05:00"


def test_invalid_and_null_inputs(spark):
    got = _bounds(spark, ["not-a-date", ""])
    for v, (s, e) in got.items():
        assert s is None and e is None


def test_ansi_hostile_inputs_yield_null_not_error(spark):
    """The contracted NULL-bounds behavior for lexically-shaped junk:
    7-char non-dates ('garbage', month 13) used to hit ANSI to_date in
    the month-end branch and FAIL the job; instants in the first days
    of year 0001 sit below Spark's Julian-rebase floor and raise 'year
    0 is out of range' even under try_ (r8 fix: explicit guards)."""
    got = _bounds(
        spark,
        ["garbage", "2015-13", "2015-02-30", "0001", "0001-01-01",
         "0001-01-01T05:00:00Z"],
    )
    for v, (s, e) in got.items():
        if v == "0001":
            # only the START (Jan 1) is under the floor; Dec 31 is fine
            assert s is None and str(e).startswith("0001-12-31")
        else:
            assert s is None and e is None, v
    # the floor guard must not leak into ordinary early years
    (se,) = _bounds(spark, ["0002"]).values()
    assert str(se[0]).startswith("0002-01-01")
