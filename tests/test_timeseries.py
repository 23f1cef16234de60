"""Resample + gap-fill operator tests."""

from datetime import datetime

from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators.timeseries import gap_fill_locf, resample


def test_resample_and_gap_fill_locf(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 10), 1.0),
        ("a", datetime(2024, 1, 1, 0, 50), 3.0),   # same hour bucket
        ("a", datetime(2024, 1, 1, 3, 5), 10.0),   # 2-hour gap before this
        ("b", datetime(2024, 1, 1, 5, 0), 7.0),    # single-bucket series
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    r = resample(df, "ts", "1 hour", ["k"], {"n": F.count("*"), "avg_v": F.avg("v")})
    got = {(x.k, str(x.bucket_start)): (x.n, x.avg_v) for x in r.collect()}
    assert got[("a", "2024-01-01 00:00:00")] == (2, 2.0)
    assert got[("a", "2024-01-01 03:00:00")] == (1, 10.0)
    assert len(got) == 3

    filled = gap_fill_locf(r, ["k"], ["n", "avg_v"], "1 hour").collect()
    by_key = {}
    for x in filled:
        by_key.setdefault(x.k, []).append(x)
    a = sorted(by_key["a"], key=lambda x: x.bucket_start)
    # dense grid: 00,01,02,03 for key a
    assert [str(x.bucket_start) for x in a] == [
        "2024-01-01 00:00:00", "2024-01-01 01:00:00",
        "2024-01-01 02:00:00", "2024-01-01 03:00:00",
    ]
    # gap rows carry the last observation forward and are flagged
    assert [x.is_gap for x in a] == [False, True, True, False]
    assert [x.avg_v for x in a] == [2.0, 2.0, 2.0, 10.0]
    assert [x.n for x in a] == [2, 2, 2, 1]
    # single-bucket series: no gaps generated
    assert len(by_key["b"]) == 1 and by_key["b"][0].is_gap is False


def test_gap_fill_interpolate(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 0, 30), 10.0),
        ("a", datetime(2024, 1, 1, 3, 30), 40.0),  # gap of 2 buckets
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    from parquet_on_fhir_spark.operators.timeseries import gap_fill_interpolate

    r = resample(df, "ts", "1 hour", ["k"], {"v": F.avg("v")})
    out = sorted(
        gap_fill_interpolate(r, ["k"], ["v"], "1 hour").collect(),
        key=lambda x: x.bucket_start,
    )
    assert [x.v for x in out] == [10.0, 20.0, 30.0, 40.0]
    assert [x.is_gap for x in out] == [False, True, True, False]


def test_detect_anomalies_trailing_window(spark):
    from parquet_on_fhir_spark.operators.timeseries import detect_anomalies

    # 10 stable points then a spike; the spike must be flagged and the
    # stable points must not; cold-start rows never flag
    rows = [("a", i, 10.0 + (i % 2) * 0.2) for i in range(10)]
    rows.append(("a", 10, 50.0))  # spike
    rows.append(("a", 11, 10.1))  # back to normal (spike in its baseline)
    df = spark.createDataFrame(rows, "k string, ts long, v double")
    out = {r.ts: r for r in detect_anomalies(
        df, "ts", "v", ["k"], lookback=10, z_threshold=3.0
    ).collect()}
    assert out[10].is_anomaly
    assert not any(out[i].is_anomaly for i in range(10))
    # cold start: first min_history rows have NULL z
    assert all(out[i].z_score is None for i in range(5))


def test_sessionize_gap_boundaries(spark):
    from datetime import datetime as dt

    from parquet_on_fhir_spark.operators.timeseries import sessionize

    rows = [
        ("a", dt(2024, 1, 1, 0, 0, 0)),
        ("a", dt(2024, 1, 1, 0, 29, 59)),  # within gap: same session
        ("a", dt(2024, 1, 1, 0, 59, 59)),  # exactly 30m later: same (gap NOT exceeded)
        ("a", dt(2024, 1, 1, 1, 30, 0)),   # 30m + 1s later: new session
        ("b", dt(2024, 1, 1, 0, 0, 0)),    # separate key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = sorted(
        sessionize(df, "ts", ["k"], gap="30 minutes").collect(),
        key=lambda r: (r.k, r.ts),
    )
    a = [r for r in out if r.k == "a"]
    assert a[0].session_id == a[1].session_id == a[2].session_id
    assert a[3].session_id != a[0].session_id
    assert [r.session_seq for r in a] == [1, 2, 3, 1]
    b = [r for r in out if r.k == "b"]
    assert b[0].session_seq == 1


def test_ewma_matches_truncated_reference(spark):
    from parquet_on_fhir_spark.operators.timeseries import ewma

    vals = [1.0, 5.0, 2.0, 8.0, 3.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], "k string, ts long, v double"
    )
    out = sorted(ewma(df, "ts", "v", ["k"], alpha=0.3, lookback=50).collect(),
                 key=lambda r: r.ts)
    a = 0.3
    for t_idx, r in enumerate(out):
        window = vals[: t_idx + 1]
        ws = sum(x * (1 - a) ** (len(window) - 1 - j) for j, x in enumerate(window))
        z = sum((1 - a) ** (len(window) - 1 - j) for j in range(len(window)))
        assert abs(r.ewma - ws / z) < 1e-9, (t_idx, r.ewma, ws / z)
    # smoothed series is pulled toward recent values
    assert out[-1].ewma != vals[-1]


def test_scd2_collapses_runs_and_intervals(spark):
    from parquet_on_fhir_spark.operators.timeseries import scd2

    rows = [
        ("u1", datetime(2024, 1, 1, 0, 0), 1, "view"),
        ("u1", datetime(2024, 1, 1, 0, 5), 2, "view"),   # unchanged: collapses
        ("u1", datetime(2024, 1, 1, 0, 9), 3, "click"),  # new version
        ("u1", datetime(2024, 1, 1, 0, 20), 4, "view"),  # back again: 3rd version
        ("u2", datetime(2024, 1, 1, 1, 0), 5, "error"),  # single-version key
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, a string")
    out = scd2(df, ["k"], "ts", ["a"], tie_cols=["eid"]).collect()
    u1 = sorted([r for r in out if r.k == "u1"], key=lambda r: r.valid_from)
    assert [r.a for r in u1] == ["view", "click", "view"]
    # contiguous, half-open: each valid_to == next valid_from
    assert u1[0].valid_to == u1[1].valid_from
    assert u1[1].valid_to == u1[2].valid_from
    assert u1[2].valid_to is None and u1[2].is_current
    assert not u1[0].is_current and not u1[1].is_current
    (u2,) = [r for r in out if r.k == "u2"]
    assert u2.is_current and u2.valid_to is None


def test_ohlc_open_close_tie_break(spark):
    from parquet_on_fhir_spark.operators.timeseries import ohlc

    ts = datetime(2024, 1, 1, 10, 30)
    rows = [  # equal timestamps: tie broken by eid
        ("k", ts, 2, 5.0),
        ("k", ts, 1, 9.0),          # open (lowest eid at earliest ts)
        ("k", datetime(2024, 1, 1, 10, 45), 3, 1.0),  # close + low
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, v double")
    (bar,) = ohlc(df, "ts", ["k"], "v", every="1 hour", tie_cols=["eid"]).collect()
    assert str(bar.bucket_start) == "2024-01-01 10:00:00"
    assert (bar.open, bar.high, bar.low, bar.close) == (9.0, 9.0, 1.0, 1.0)
    assert (bar.n, bar.vsum) == (3, 15.0)


def test_time_weighted_avg_weights_by_gap(spark):
    from parquet_on_fhir_spark.operators.timeseries import time_weighted_avg

    rows = [
        # value 10 held 1 min, value 20 held 3 min, final value unweighted
        ("k", datetime(2024, 1, 1, 0, 0), 1, 10.0),
        ("k", datetime(2024, 1, 1, 0, 1), 2, 20.0),
        ("k", datetime(2024, 1, 1, 0, 4), 3, 99.0),
        ("solo", datetime(2024, 1, 1, 0, 0), 4, 5.0),  # no gap: NULL twa
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, v double")
    got = {r.k: r.twa for r in time_weighted_avg(df, "ts", ["k"], "v", tie_cols=["eid"]).collect()}
    assert abs(got["k"] - (10.0 * 60 + 20.0 * 180) / 240) < 1e-9
    assert got["solo"] is None


def test_scd2_matches_python_reference_random(spark):
    import random

    from parquet_on_fhir_spark.operators.timeseries import scd2

    rng = random.Random(11)
    rows = []
    eid = 0
    for k in range(8):
        t0 = 0
        for _ in range(rng.randrange(0, 30)):
            t0 += rng.randrange(0, 3)  # duplicate timestamps on purpose
            rows.append((f"k{k}", datetime(2024, 1, 1, 0, 0, t0), eid,
                         rng.choice("abc")))
            eid += 1
    if not rows:
        return
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, a string")

    expected = {}
    by_key = {}
    for k, ts, e, a in rows:
        by_key.setdefault(k, []).append((ts, e, a))
    for k, seq in by_key.items():
        seq.sort(key=lambda x: (x[0], x[1]))
        versions = []
        for ts, e, a in seq:
            if not versions or versions[-1][0] != a:
                versions.append([a, ts, None])
        for i in range(len(versions) - 1):
            versions[i][2] = versions[i + 1][1]
        expected[k] = [(a, vf, vt) for a, vf, vt in versions]

    got = {}
    for r in scd2(df, ["k"], "ts", ["a"], tie_cols=["eid"]).collect():
        got.setdefault(r.k, []).append((r.a, r.valid_from, r.valid_to, r.is_current))
    for k in got:
        got[k].sort(key=lambda x: x[1])
        assert [(a, vf, vt) for a, vf, vt, _ in got[k]] == expected[k]
        assert [c for *_, c in got[k]] == [False] * (len(got[k]) - 1) + [True]
    assert set(got) == set(expected)


def test_autocorrelation_alternating_and_linear(spark):
    from parquet_on_fhir_spark.operators.timeseries import autocorrelation

    rows = []
    for i in range(40):  # alternating: acf_1 = -1, acf_2 = +1
        rows.append(("alt", datetime(2024, 1, 1, 0, i), i, 1.0 if i % 2 else -1.0))
    for i in range(40):  # linear ramp: all lags ~ +1
        rows.append(("lin", datetime(2024, 1, 1, 0, i), i, float(i)))
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, v double")
    got = {
        r.k: (r.acf_1, r.acf_2)
        for r in autocorrelation(df, "ts", ["k"], "v", lags=[1, 2], tie_cols=["eid"]).collect()
    }
    assert abs(got["alt"][0] + 1.0) < 1e-9 and abs(got["alt"][1] - 1.0) < 1e-9
    assert got["lin"][0] > 0.999 and got["lin"][1] > 0.999


def test_autocorrelation_short_series_null(spark):
    from parquet_on_fhir_spark.operators.timeseries import autocorrelation

    rows = [("s", datetime(2024, 1, 1, 0, 0), 1, 1.0), ("s", datetime(2024, 1, 1, 0, 1), 2, 2.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid int, v double")
    (r,) = autocorrelation(df, "ts", ["k"], "v", lags=[3], tie_cols=["eid"]).collect()
    assert r.acf_3 is None


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """A pure seasonal signal on a linear trend: the decomposition must
    recover both components (up to edge rows, which stay NULL)."""
    from parquet_on_fhir_spark.operators.timeseries import seasonal_decompose
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    season = [3.0, -1.0, -2.0, 0.0]  # sums to zero, period 4
    rows = [
        ("k", t0 + timedelta(hours=i), 10.0 + 0.5 * i + season[i % 4])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = seasonal_decompose(df, "ts", ["k"], "v", period=4).collect()
    full = [r for r in out if r.trend is not None]
    assert len(full) == 36  # 2 edge rows lost each side
    for r in full:
        i = int((r.ts - t0).total_seconds() // 3600)
        assert abs(r.trend - (10.0 + 0.5 * i)) < 1e-9
        assert abs(r.seasonal - season[i % 4]) < 1e-9
        assert abs(r.residual) < 1e-9
    # odd period path: period 5 on a 5-cycle
    s5 = [2.0, 1.0, 0.0, -1.0, -2.0]
    rows5 = [
        ("k", t0 + timedelta(hours=i), 7.0 + s5[i % 5]) for i in range(25)
    ]
    df5 = spark.createDataFrame(rows5, "k string, ts timestamp, v double")
    out5 = [r for r in seasonal_decompose(df5, "ts", ["k"], "v", period=5).collect()
            if r.trend is not None]
    assert len(out5) == 21
    for r in out5:
        i = int((r.ts - t0).total_seconds() // 3600)
        assert abs(r.trend - 7.0) < 1e-9 and abs(r.seasonal - s5[i % 5]) < 1e-9


def test_gap_report_flags_only_long_gaps(spark):
    from parquet_on_fhir_spark.operators.timeseries import gap_report
    from datetime import datetime

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0)),
        ("a", datetime(2024, 1, 1, 0, 10)),   # 10 min: fine
        ("a", datetime(2024, 1, 1, 2, 0)),    # 110 min gap: flagged
        ("b", datetime(2024, 1, 1, 0, 0)),    # singleton: no gap rows
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = gap_report(df, "ts", ["k"], "15 minutes").collect()
    assert len(got) == 1
    (g,) = got
    assert g.k == "a" and g.gap_seconds == 6600


def test_holt_smoothing_matches_reference_loop(spark):
    """applyInPandas Holt == a hand-rolled reference recurrence, per key,
    independent of input row order."""
    from datetime import datetime, timedelta

    from parquet_on_fhir_spark.operators.timeseries import holt_smoothing

    t0 = datetime(2024, 1, 1)
    series = {
        "a": [10.0, 12.0, 11.0, 15.0, 18.0, 17.0],
        "b": [5.0],
    }
    rows = [
        (k, t0 + timedelta(hours=i), v)
        for k, vs in series.items()
        for i, v in enumerate(vs)
    ]
    import random

    random.Random(0).shuffle(rows)
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = holt_smoothing(df, "ts", ["k"], "v", alpha=0.4, beta=0.2)
    got = {
        (r.k, r.ts): (r.level, r.trend, r.fitted) for r in out.collect()
    }

    def reference(ys, a=0.4, b=0.2):
        lvl, trd = [ys[0]], [(ys[1] - ys[0]) if len(ys) > 1 else 0.0]
        fits = [None]
        for i in range(1, len(ys)):
            f = lvl[-1] + trd[-1]
            nl = a * ys[i] + (1 - a) * f
            trd.append(b * (nl - lvl[-1]) + (1 - b) * trd[-1])
            lvl.append(nl)
            fits.append(f)
        return lvl, trd, fits

    for k, ys in series.items():
        lvl, trd, fits = reference(ys)
        for i in range(len(ys)):
            g = got[(k, t0 + timedelta(hours=i))]
            assert abs(g[0] - lvl[i]) < 1e-12
            assert abs(g[1] - trd[i]) < 1e-12
            if fits[i] is None:
                assert g[2] is None
            else:
                assert abs(g[2] - fits[i]) < 1e-12


def test_cusum_detects_level_shift(spark):
    """A planted mean shift must trip CUSUM shortly after onset, with
    the accumulator resetting after the alarm; a flat series never
    alarms. Matches a hand-rolled reference recurrence exactly."""
    from datetime import datetime, timedelta

    from parquet_on_fhir_spark.operators.timeseries import cusum_changepoints

    t0 = datetime(2024, 1, 1)
    vals = [0.0, 0.1, -0.1, 0.0, 0.1, -0.1] * 5 + [5.0] * 10  # shift at i=30
    rows = [("k", t0 + timedelta(hours=i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = sorted(
        cusum_changepoints(df, "ts", ["k"], "v", threshold=4.0, drift=0.5).collect(),
        key=lambda r: r.ts,
    )
    alarms = [i for i, r in enumerate(out) if r.is_changepoint]
    assert alarms and 30 <= alarms[0] <= 35  # fires shortly after onset

    # reference recurrence (same standardization)
    import numpy as np

    y = np.array(vals)
    z = (y - y.mean()) / y.std()
    cp = cn = 0.0
    for i, r in enumerate(out):
        cp = max(0.0, cp + z[i] - 0.5)
        cn = max(0.0, cn - z[i] - 0.5)
        assert abs(r.cusum_pos - cp) < 1e-9 and abs(r.cusum_neg - cn) < 1e-9
        if cp > 4.0 or cn > 4.0:
            assert r.is_changepoint
            cp = cn = 0.0
        else:
            assert not r.is_changepoint

    flat = spark.createDataFrame(
        [("k", t0 + timedelta(hours=i), 1.0) for i in range(50)],
        "k string, ts timestamp, v double",
    )
    assert (
        cusum_changepoints(flat, "ts", ["k"], "v")
        .filter(F.col("is_changepoint"))
        .count()
        == 0
    )


def test_holt_cusum_tie_cols_deterministic(spark):
    """Series with TIED timestamps produce layout-dependent output
    unless tie_cols pins the in-group order — both recurrences must
    return identical values across shuffled input layouts."""
    from datetime import datetime, timedelta

    from parquet_on_fhir_spark.operators.timeseries import (
        cusum_changepoints,
        holt_smoothing,
    )

    t0 = datetime(2024, 1, 1)
    # two observations share each timestamp; seq breaks the tie
    rows = [
        ("k", t0 + timedelta(hours=i // 2), i, float((i * 7) % 13))
        for i in range(12)
    ]
    import random

    for seed in (0, 1):
        shuffled = rows[:]
        random.Random(seed).shuffle(shuffled)
        df = spark.createDataFrame(
            shuffled, "k string, ts timestamp, seq int, v double"
        ).repartition(4)
        h = {
            (r.ts, r.v): (r.level, r.trend)
            for r in holt_smoothing(
                df, "ts", ["k"], "v", tie_cols=["seq"]
            ).collect()
        }
        c = {
            (r.ts, r.v): (r.cusum_pos, r.cusum_neg)
            for r in cusum_changepoints(
                df, "ts", ["k"], "v", threshold=2.0, drift=0.1,
                tie_cols=["seq"],
            ).collect()
        }
        if seed == 0:
            h0, c0 = h, c
    assert h == h0 and c == c0


def test_ljung_box_matches_numpy(spark):
    """ljung_box vs a numpy standard-ACF + Box-Jenkins Q reference;
    constant series yields NULL q_stat (zero variance)."""
    import numpy as np

    from parquet_on_fhir_spark.operators.timeseries import ljung_box

    rng = np.random.RandomState(17)
    x = rng.randn(300).cumsum() * 0.3 + rng.randn(300)
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(x)],
        "k string, t int, v double",
    )
    r = ljung_box(df, "t", ["k"], "v", 5).collect()[0]
    n = len(x)
    d = x - x.mean()
    den = (d * d).sum()
    rhos = [(d[k:] * d[:-k]).sum() / den for k in range(1, 6)]
    q_ref = n * (n + 2) * sum(
        rho**2 / (n - k) for k, rho in zip(range(1, 6), rhos)
    )
    for k in range(1, 6):
        assert abs(getattr(r, f"acf_{k}") - rhos[k - 1]) < 1e-9
    assert abs(r.q_stat - q_ref) < 1e-6
    assert r.n == 300 and r.dof == 5
    const = spark.createDataFrame(
        [("k", i, 5.0) for i in range(20)], "k string, t int, v double"
    )
    assert ljung_box(const, "t", ["k"], "v", 3).collect()[0].q_stat is None


def test_peak_concurrency_reference_and_conventions(spark):
    """Sweep-line peak vs a brute-force per-instant reference; half-open
    back-to-back intervals count once; earliest peak timestamp wins;
    NULL endpoints drop; end <= start raises."""
    import datetime as dt
    import random

    import pytest

    from parquet_on_fhir_spark.operators.timeseries import peak_concurrency

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    rows = [
        ("a", T(1), T(3)), ("a", T(2), T(4)), ("a", T(3), T(5)),
        ("b", T(1), T(2)), ("b", T(2), T(3)),
        ("c", T(1), T(10)), ("c", None, T(4)), ("c", T(2), None),
    ]
    df = spark.createDataFrame(rows, ["g", "s", "e"])
    got = {r["g"]: r for r in peak_concurrency(df, "s", "e", ["g"]).collect()}
    assert got["a"]["peak"] == 2 and got["a"]["peak_at"] == T(2)
    assert got["b"]["peak"] == 1 and got["b"]["peak_at"] == T(1)
    assert got["c"]["peak"] == 1  # NULL-endpoint rows dropped

    # randomized cross-check vs brute force over event instants
    rng = random.Random(3)
    iv = []
    for _ in range(120):
        s = T(rng.randrange(1, 20), rng.randrange(0, 60))
        e = s + dt.timedelta(minutes=rng.randrange(1, 300))
        iv.append(("g", s, e))
    df2 = spark.createDataFrame(iv, ["g", "s", "e"])
    r2 = peak_concurrency(df2, "s", "e", ["g"]).collect()[0]
    instants = sorted({s for _, s, _ in iv} | {e for _, _, e in iv})
    brute = max(
        sum(1 for _, s, e in iv if s <= t < e) for t in instants
    )
    assert r2["peak"] == brute

    bad = spark.createDataFrame([("x", T(3), T(3))], ["g", "s", "e"])
    with pytest.raises(Exception, match="half-open"):
        peak_concurrency(bad, "s", "e", ["g"]).collect()


def test_holt_winters_seasonal_matches_reference(spark):
    """holt_winters_seasonal vs an independent python recurrence on a
    planted level+trend+seasonal series; init conventions pinned;
    short-series and parameter guards."""
    import math

    import pytest

    from parquet_on_fhir_spark.operators.timeseries import (
        holt_winters_seasonal,
    )

    p, n = 4, 20
    a, b, g = 0.4, 0.2, 0.3
    season = [5.0, -2.0, -1.0, -2.0]
    y = [10.0 + 0.7 * i + season[i % p] + (0.1 * ((i * 7) % 5)) for i in range(n)]
    rows = [(1, i, y[i]) for i in range(n)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = (
        holt_winters_seasonal(df, "t", ["k"], "v", period=p,
                              alpha=a, beta=b, gamma=g)
        .orderBy("t")
        .collect()
    )
    # independent reference
    lvl = [math.nan] * n
    trd = [math.nan] * n
    ssn = [math.nan] * n
    fit = [math.nan] * n
    l0 = sum(y[:p]) / p
    b0 = (sum(y[p:2 * p]) / p - sum(y[:p]) / p) / p
    for i in range(p):
        ssn[i] = y[i] - l0
    lvl[p - 1] = l0
    trd[p - 1] = b0
    for i in range(p, n):
        fit[i] = lvl[i - 1] + trd[i - 1] + ssn[i - p]
        lvl[i] = a * (y[i] - ssn[i - p]) + (1 - a) * (lvl[i - 1] + trd[i - 1])
        trd[i] = b * (lvl[i] - lvl[i - 1]) + (1 - b) * trd[i - 1]
        ssn[i] = g * (y[i] - lvl[i]) + (1 - g) * ssn[i - p]
    for i, r in enumerate(got):
        for name, ref in (("level", lvl), ("trend", trd),
                          ("season", ssn), ("fitted", fit)):
            gv = r[name]
            if math.isnan(ref[i]):
                assert gv is None or math.isnan(gv), (i, name, gv)
            else:
                assert abs(gv - ref[i]) < 1e-9, (i, name, gv, ref[i])
    # a strongly seasonal series should be fitted well after burn-in
    err = [abs(r["fitted"] - y[i]) for i, r in enumerate(got) if i >= 2 * p]
    assert sum(err) / len(err) < 1.0

    short = spark.createDataFrame([(1, 0, 1.0), (1, 1, 2.0)], ["k", "t", "v"])
    with pytest.raises(Exception, match="shorter than one period"):
        holt_winters_seasonal(short, "t", ["k"], "v", period=4).collect()
    with pytest.raises(ValueError, match="period"):
        holt_winters_seasonal(df, "t", ["k"], "v", period=1)


def test_holt_winters_multiplicative_matches_reference(spark):
    """seasonal='mul' (r13) vs an independent python recurrence on a
    planted multiplicative-seasonal series; positivity guard."""
    import math

    import pytest

    from parquet_on_fhir_spark.operators.timeseries import (
        holt_winters_seasonal,
    )

    p, n = 4, 24
    a, b, g, ph = 0.4, 0.2, 0.3, 0.9
    season = [1.5, 0.7, 0.9, 0.9]
    y = [(20.0 + 0.5 * i) * season[i % p] * (1 + 0.01 * ((i * 3) % 5))
         for i in range(n)]
    df = spark.createDataFrame([(1, i, y[i]) for i in range(n)],
                               ["k", "t", "v"])
    got = (
        holt_winters_seasonal(df, "t", ["k"], "v", period=p, alpha=a,
                              beta=b, gamma=g, seasonal="mul", phi=ph)
        .orderBy("t").collect()
    )
    lvl = [math.nan] * n
    trd = [math.nan] * n
    ssn = [math.nan] * n
    fit = [math.nan] * n
    l0 = sum(y[:p]) / p
    b0 = (sum(y[p:2 * p]) / p - l0) / p
    for i in range(p):
        ssn[i] = y[i] / l0
    lvl[p - 1] = l0
    trd[p - 1] = b0
    for i in range(p, n):
        prev = lvl[i - 1] + ph * trd[i - 1]
        fit[i] = prev * ssn[i - p]
        lvl[i] = a * (y[i] / ssn[i - p]) + (1 - a) * prev
        trd[i] = b * (lvl[i] - lvl[i - 1]) + (1 - b) * ph * trd[i - 1]
        ssn[i] = g * (y[i] / lvl[i]) + (1 - g) * ssn[i - p]
    for i, r in enumerate(got):
        for name, ref in (("level", lvl), ("trend", trd),
                          ("season", ssn), ("fitted", fit)):
            gv = r[name]
            if math.isnan(ref[i]):
                assert gv is None or math.isnan(gv), (i, name, gv)
            else:
                assert abs(gv - ref[i]) < 1e-9, (i, name, gv, ref[i])
    # a strongly multiplicative series should fit well after burn-in
    err = [abs(r["fitted"] - y[i]) / y[i] for i, r in enumerate(got)
           if i >= 2 * p]
    assert sum(err) / len(err) < 0.05

    neg = spark.createDataFrame(
        [(1, i, float(i - 2)) for i in range(8)], ["k", "t", "v"])
    with pytest.raises(Exception, match="strictly positive"):
        holt_winters_seasonal(neg, "t", ["k"], "v", period=4,
                              seasonal="mul").collect()


def test_holt_winters_damped_trend_properties(spark):
    """phi semantics (r13): phi=1 reproduces the undamped path
    bit-for-bit; phi<1 on a trend-then-flat series damps the trend
    toward zero faster than the undamped fit; parameter guard."""
    import pytest

    from parquet_on_fhir_spark.operators.timeseries import (
        holt_winters_seasonal,
    )

    p, n = 4, 32
    season = [2.0, -1.0, 0.5, -1.5]
    # trend for the first half, flat afterwards
    y = [(0.8 * min(i, 15)) + 10 + season[i % p] for i in range(n)]
    df = spark.createDataFrame([(1, i, y[i]) for i in range(n)],
                               ["k", "t", "v"])

    undamped = (
        holt_winters_seasonal(df, "t", ["k"], "v", period=p)
        .orderBy("t").collect()
    )
    phi1 = (
        holt_winters_seasonal(df, "t", ["k"], "v", period=p, phi=1.0)
        .orderBy("t").collect()
    )
    for r1, r2 in zip(undamped, phi1):
        assert r1["level"] == r2["level"]
        assert r1["trend"] == r2["trend"]

    damped = (
        holt_winters_seasonal(df, "t", ["k"], "v", period=p, phi=0.8)
        .orderBy("t").collect()
    )
    # after the flat regime settles, the damped trend is closer to 0
    assert abs(damped[-1]["trend"]) < abs(undamped[-1]["trend"])
    assert abs(damped[-1]["trend"]) < 0.05

    with pytest.raises(ValueError, match="phi"):
        holt_winters_seasonal(df, "t", ["k"], "v", period=p, phi=0.0)
    with pytest.raises(ValueError, match="seasonal"):
        holt_winters_seasonal(df, "t", ["k"], "v", period=p,
                              seasonal="bogus")


def test_kalman_local_level_matches_reference(spark):
    """kalman_local_level (r14): element-wise agreement with an
    independent textbook local-level filter + RTS smoother, adaptive
    gain monotone-decreasing to a steady state, smoother variance
    benefit (smoothed tracks a noiseless constant exactly), and
    parameter guards."""
    import numpy as np
    import pytest

    from parquet_on_fhir_spark.operators.timeseries import (
        kalman_local_level,
    )

    rng = np.random.default_rng(7)
    series = {}
    rows = []
    for uid in range(4):
        level = 10.0 * (uid + 1)
        y = []
        for i in range(40):
            if i == 20 and uid % 2:
                level += 25.0  # planted step
            level += rng.normal(0, 1.0)
            obs = level + rng.normal(0, 2.0)
            y.append(obs)
            rows.append((uid, i, float(obs)))
        series[uid] = np.array(y)
    df = spark.createDataFrame(rows, "user_id long, ts long, value double")
    q, r = 1.0, 4.0
    got = kalman_local_level(df, "ts", ["user_id"], "value", q=q, r=r)
    out = {}
    for row in got.collect():
        out.setdefault(row["user_id"], {})[row["ts"]] = row

    def reference(y):
        n = len(y)
        m = np.empty(n); P = np.empty(n); Pp = np.empty(n)
        m[0], P[0], Pp[0] = y[0], r, r
        for t_i in range(1, n):
            pp = P[t_i - 1] + q
            Pp[t_i] = pp
            k = pp / (pp + r)
            m[t_i] = m[t_i - 1] + k * (y[t_i] - m[t_i - 1])
            P[t_i] = (1 - k) * pp
        ms = m.copy()
        for t_i in range(n - 2, -1, -1):
            ms[t_i] = m[t_i] + (P[t_i] / Pp[t_i + 1]) * (
                ms[t_i + 1] - m[t_i]
            )
        return m, P, ms

    for uid, y in series.items():
        m, P, ms = reference(y)
        for i in range(len(y)):
            row = out[uid][i]
            assert abs(row["filtered"] - m[i]) < 1e-9
            assert abs(row["variance"] - P[i]) < 1e-9
            assert abs(row["smoothed"] - ms[i]) < 1e-9
        # gain decreases monotonically to the steady state (no steps
        # in P recursion — gain depends only on t)
        gains = [out[uid][i]["gain"] for i in range(1, len(y))]
        assert all(
            gains[j + 1] <= gains[j] + 1e-12 for j in range(len(gains) - 1)
        )
    # noiseless constant series: filtered and smoothed == the constant
    const = spark.createDataFrame(
        [(1, i, 5.0) for i in range(10)], "user_id long, ts long, value double"
    )
    crows = kalman_local_level(const, "ts", ["user_id"], "value").collect()
    assert all(abs(r2["smoothed"] - 5.0) < 1e-12 for r2 in crows)
    with pytest.raises(ValueError):
        kalman_local_level(df, "ts", ["user_id"], "value", q=0)
    with pytest.raises(ValueError):
        kalman_local_level(df, "ts", ["user_id"], "value", r=-1)
