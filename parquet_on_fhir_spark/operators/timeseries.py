"""Time-series resampling and gap filling (the hypertable
`time_bucket` / `locf` / `interpolate` surface, TimescaleDB-style,
re-expressed as Spark windows).

Everything stays declarative: bucketing is ``F.window`` (map-side),
the dense bucket grid is a per-key ``sequence`` + ``explode`` (no
driver loop, no cross join with a calendar table), and carry-forward
is ``last(value, ignorenulls=True)`` over an ordered window — one
shuffle keyed by the series key, which also co-locates every later
per-key computation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    every: str,
    key_cols: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Aggregate a series to fixed time buckets: one row per (keys,
    bucket) that has data. ``aggs`` maps output name → aggregate
    Column. Pure groupBy — partial aggregation map-side, shuffle rows
    = populated buckets.

    Output columns: *key_cols, bucket_start (timestamp), *aggs.
    """
    bucket = F.window(F.col(ts_col), every)
    return (
        df.groupBy(*key_cols, bucket.alias("__w"))
        .agg(*[c.alias(name) for name, c in aggs.items()])
        .select(
            *key_cols,
            F.col("__w.start").alias("bucket_start"),
            *aggs.keys(),
        )
    )


def gap_fill_locf(
    resampled: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    every: str,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Densify a resampled series to EVERY bucket between each key's
    first and last observation, carrying the last observed value
    forward into the gaps (locf). Adds ``is_gap`` (true for generated
    rows).

    Plan shape: per-key min/max (hash aggregate) → ``sequence()`` of
    bucket starts per key → ``explode`` (the dense grid, generated
    distributed, proportional to output size) → left join the sparse
    observations on (keys, bucket) → ``last(ignorenulls)`` over the
    per-key ordered window. Two shuffles total (grid join + window),
    both keyed by the series key; at 100 TB the window reuses the
    join's partitioning when AQE keeps the alignment.
    """
    from parquet_on_fhir_spark.operators.joins import _interval_seconds

    step = _interval_seconds(every)
    bounds = resampled.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.col("__hi"),
                F.expr(f"INTERVAL {step} SECOND"),
            )
        ).alias(bucket_col),
    )
    joined = grid.join(
        resampled.withColumn("__obs", F.lit(True)),
        [*key_cols, bucket_col],
        "left",
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = [
        F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in value_cols
    ]
    return joined.select(
        *key_cols,
        bucket_col,
        *filled,
        F.col("__obs").isNull().alias("is_gap"),
    )


def gap_fill_interpolate(
    resampled: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    every: str,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Densify like :func:`gap_fill_locf` but fill gaps by LINEAR
    interpolation between the surrounding observations (the hypertable
    ``interpolate()`` counterpart to locf): a gap bucket at fraction f
    of the way from the previous observation to the next gets
    ``prev + (next - prev) * f``. Buckets before the first / after the
    last observation of a key have no bracketing pair and stay at the
    observed boundary value (locf/nocb at the edges; interior-only
    interpolation). Same two-shuffle plan as locf — the forward and
    backward scans are two frames over ONE window partitioning.
    """
    from parquet_on_fhir_spark.operators.joins import _interval_seconds

    step = _interval_seconds(every)
    bounds = resampled.groupBy(*key_cols).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = bounds.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.col("__hi"),
                F.expr(f"INTERVAL {step} SECOND"),
            )
        ).alias(bucket_col),
    )
    joined = grid.join(
        resampled.withColumn("__obs", F.lit(True)),
        [*key_cols, bucket_col],
        "left",
    )
    back = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # The grid is uniform (one row per `every`), so the interpolation
    # fraction uses row POSITION, not epoch arithmetic — works for
    # TIMESTAMP and TIMESTAMP_NTZ buckets alike (NTZ has no double cast).
    pos_w = Window.partitionBy(*key_cols).orderBy(bucket_col)
    idx = F.row_number().over(pos_w).cast("double")
    prev_ts = F.last(F.when(F.col("__obs"), idx), ignorenulls=True).over(back)
    next_ts = F.first(F.when(F.col("__obs"), idx), ignorenulls=True).over(fwd)
    span = next_ts - prev_ts
    frac = F.when(span > 0, (idx - prev_ts) / span).otherwise(F.lit(0.0))
    filled = []
    for c in value_cols:
        v = F.col(c).cast("double")
        prev_v = F.last(F.when(F.col("__obs"), v), ignorenulls=True).over(back)
        next_v = F.first(F.when(F.col("__obs"), v), ignorenulls=True).over(fwd)
        interp = F.coalesce(
            v,  # observed buckets keep their exact value
            prev_v + (next_v - prev_v) * frac,  # interior gaps
            prev_v,  # past the last observation
            next_v,  # before the first observation
        )
        filled.append(interp.alias(c))
    return joined.select(
        *key_cols,
        bucket_col,
        *filled,
        F.col("__obs").isNull().alias("is_gap"),
    )


def detect_anomalies(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    lookback: int = 20,
    z_threshold: float = 3.0,
    min_history: int = 5,
) -> DataFrame:
    """Trailing-window z-score anomaly detection: a point is anomalous
    when it deviates from the mean of the PRECEDING ``lookback``
    observations by more than ``z_threshold`` trailing standard
    deviations. The window excludes the current row (a spike must not
    mask itself by inflating its own baseline), and points with fewer
    than ``min_history`` preceding observations are never flagged
    (cold-start suppression).

    One window shuffle keyed by the series key; rows-preceding frames
    are streaming-evaluated per partition (no quadratic re-scan).
    Adds: trailing_mean, trailing_std, z_score (NULL when history is
    short or flat), is_anomaly.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg(F.col(value_col)).over(w)
    std = F.stddev_samp(F.col(value_col)).over(w)
    n = F.count(F.col(value_col)).over(w)
    z = F.when(
        (n >= min_history) & (std > 0),
        (F.col(value_col) - mean) / std,
    )
    return (
        df.withColumn("trailing_mean", mean)
        .withColumn("trailing_std", std)
        .withColumn("z_score", z)
        .withColumn(
            "is_anomaly", F.coalesce(F.abs(z) > z_threshold, F.lit(False))
        )
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 minutes",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Assign a session id to EVERY event (the labelling counterpart of
    ``session_window``, which only aggregates): a new session starts
    when the gap since the key's previous event exceeds ``gap``.
    ``session_id`` is the microsecond epoch of the session's first
    event —
    deterministic, layout-independent, and equal to the session_window
    start for the same gap. Adds ``session_seq`` (1-based event index
    within the session).

    One window shuffle keyed by the series key; the lag + running-sum
    session numbering and the per-session sequence reuse the same
    partitioning.
    """
    from parquet_on_fhir_spark.operators.joins import _interval_seconds

    gap_us = _interval_seconds(gap) * 1_000_000
    order = [ts_col, *(tie_cols or [])]  # tie_cols pin equal-timestamp order
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # microsecond epoch: sub-second gaps count exactly (a plain long
    # cast truncates to seconds and shifts boundaries at the gap edge)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(epoch).over(w)
    new_session = F.when(
        prev.isNull() | (epoch - prev > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*key_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess_n = F.sum(new_session).over(run)
    per_sess = Window.partitionBy(*key_cols, "__sess_n").orderBy(*order)
    return (
        df.withColumn("__sess_n", sess_n)
        .withColumn("session_seq", F.row_number().over(per_sess))
        .withColumn(
            "session_id",
            F.first(epoch).over(
                per_sess.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .drop("__sess_n")
    )


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    key_cols: list[str],
    alpha: float = 0.3,
    lookback: int = 50,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average with a bounded lookback:
    ``ewma_t = Σ_{j=0..L} α(1-α)^j · x_{t-j} / Σ α(1-α)^j`` — the
    truncated-window form of the recursive EWMA (the tail beyond L
    carries weight (1-α)^{L+1}; at the default α=0.3, L=50 that is
    ~1e-8 — below float display precision).

    The recursion itself is not expressible as a Spark window
    aggregate; the truncation makes it one: a windowed
    ``collect_list`` of the trailing L+1 values feeds a single
    ``aggregate`` HOF computing the weighted sum — per-row cost O(L),
    one window shuffle keyed by series, no UDF.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(-lookback, 0)
    )
    # newest-last; weight index j counts back from the end
    trail = F.collect_list(F.col(value_col).cast("double")).over(w)
    n = F.size(trail)
    decay = F.lit(1.0 - alpha)
    weighted = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("z")),
        lambda acc, i: F.struct(
            (acc["s"] + F.element_at(trail, i) * F.pow(decay, (n - i).cast("double"))).alias("s"),
            (acc["z"] + F.pow(decay, (n - i).cast("double"))).alias("z"),
        ),
        lambda acc: acc["s"] / acc["z"],
    )
    return df.withColumn(out_col, weighted)


def scd2(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Build a type-2 slowly-changing dimension from a change log:
    collapse consecutive rows per key whose tracked attributes are
    unchanged, and emit one validity interval per surviving version —
    (keys, attrs, valid_from, valid_to, is_current), with
    ``valid_to`` NULL on the open current version.

    Implementation: lag() flags rows whose attribute tuple differs
    from the key's previous row (NULL-safe via eqNullSafe on a
    struct), the flagged change rows survive a filter, and lead()
    over the SURVIVORS supplies each version's exclusive end. Both
    windows share one partitioning — a single shuffle keyed by the
    dimension key, which is exactly the write-partitioning a 100 TB
    dimension build wants anyway. No self-join: the classic
    "join changes to next change" formulation shuffles twice and
    breaks under equal timestamps; lead() does neither.
    """
    order = [ts_col, *(tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~attrs.eqNullSafe(F.lag(attrs).over(w))
    versions = df.withColumn("__chg", F.coalesce(changed, F.lit(True))).filter(
        F.col("__chg")
    )
    return (
        versions.select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            F.lead(F.col(ts_col)).over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def ohlc(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    every: str = "1 hour",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Downsample a series to per-bucket OHLC candles: open/close are
    the value at the bucket's earliest/latest event (equal timestamps
    broken by ``tie_cols`` so the result is layout-independent),
    high/low the extremes, plus event count and sum.

    Single hash aggregate — min_by/max_by keyed on the (ts, *ties)
    struct compute open/close map-side, so the shuffle carries one
    partially-folded row per (key, bucket), never the raw events. No
    window function: an ordered window would shuffle every event and
    sort; the agg formulation is the one that survives 100 TB.

    Output: *keys, bucket_start, open, high, low, close, n, vsum.
    """
    order_key = F.struct(
        F.col(ts_col), *[F.col(c) for c in (tie_cols or [])]
    )
    v = F.col(value_col)
    return (
        df.groupBy(*key_cols, F.window(F.col(ts_col), every).alias("__w"))
        .agg(
            F.min_by(v, order_key).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order_key).alias("close"),
            F.count("*").alias("n"),
            F.sum(v).alias("vsum"),
        )
        .select(
            *key_cols,
            F.col("__w.start").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n",
            "vsum",
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Duration-weighted mean per key: each observation is weighted by
    the time it remained the latest value (the gap to the key's next
    observation, microsecond precision); the final observation of a
    key carries no weight — the TimescaleDB ``time_weight('locf')``
    convention for an unbounded right edge.

    One window shuffle (lead over the key partitioning) feeding a hash
    aggregate on the same key — Spark keeps the partitioning, so the
    agg is shuffle-free. Keys with a single observation yield NULL
    (zero total weight), kept so callers can distinguish "no data"
    from "constant".

    Output: *keys, twa (double).
    """
    order = [ts_col, *(tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dt = (F.lead(epoch).over(w) - epoch).cast("double")
    return (
        df.withColumn("__dt", dt)
        .groupBy(*key_cols)
        .agg(
            (
                F.sum(F.col(value_col) * F.col("__dt")) / F.sum("__dt")
            ).alias("twa")
        )
    )


def autocorrelation(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    lags: list[int] | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Sample autocorrelation at observation lags — the seasonality /
    persistence fingerprint of a series (an ACF spike at lag 24 on an
    hourly series IS the daily cycle). Lag is in OBSERVATIONS along the
    key's time order, the plain statistical ACF convention.

    One window shuffle builds every lagged column in the same pass
    (shared partitioning); each lag then folds through corr() in ONE
    aggregate — k lags cost one shuffle + one agg, not k jobs. Keys
    with fewer than lag+2 points yield NULL for that lag.

    Output: *keys, then acf_<lag> per requested lag.
    """
    ls = lags or [1, 2, 3]
    order = [ts_col, *(tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    with_lags = df
    for lag in ls:
        with_lags = with_lags.withColumn(
            f"__lag{lag}", F.lag(F.col(value_col), lag).over(w)
        )
    return with_lags.groupBy(*key_cols).agg(
        *[
            F.corr(F.col(value_col), F.col(f"__lag{lag}")).alias(f"acf_{lag}")
            for lag in ls
        ]
    )


def seasonal_decompose(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    period: int,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Classical additive seasonal decomposition (value = trend +
    seasonal + residual) along each key's observation order — the
    moving-average method every stats text opens with, not STL.

    Trend is the centered moving average over one period: for odd
    ``period`` a plain ``avg`` over the symmetric ROWS frame; for even
    ``period`` the standard 2×MA end-point-half-weight form, expressed
    as (frame sum − (lag_h + lead_h)/2) / period — both pure window
    expressions. Seasonal indices average the detrended values per
    phase (observation index mod period) and are re-centered to sum
    to zero. Rows whose trend window is incomplete (series edges)
    carry NULL trend/seasonal/residual rather than a biased estimate.

    Plan: ONE window shuffle keyed by the series key computes trend,
    phase, and completeness in the same pass; the seasonal index is a
    (key, phase) hash aggregate — at most ``period`` rows per key —
    joined back on the SAME key columns (co-partitioned, no extra
    shuffle of the fact side under AQE). Nothing is ever globally
    sorted; 100 TB of series parallelize across keys.

    Output: input columns + trend, seasonal, residual.
    """
    order = [ts_col, *(tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    h = period // 2
    if period % 2 == 1:
        frame = w.rowsBetween(-h, h)
        trend = F.avg(value_col).over(frame)
        full = F.count(value_col).over(frame) == period
    else:
        frame = w.rowsBetween(-h, h)
        ends = (
            F.lag(F.col(value_col), h).over(w)
            + F.lead(F.col(value_col), h).over(w)
        ) / 2.0
        trend = (F.sum(value_col).over(frame) - ends) / period
        full = F.count(value_col).over(frame) == period + 1
    phase = (F.row_number().over(w) - 1) % period
    t = (
        df.withColumn("__trend", F.when(full, trend))
        .withColumn("__phase", phase)
        .withColumn("__detrend", F.col(value_col) - F.col("__trend"))
    )
    idx = t.groupBy(*key_cols, "__phase").agg(
        F.avg("__detrend").alias("__raw_seasonal")
    )
    centered = idx.withColumn(
        "__seasonal",
        F.col("__raw_seasonal")
        - F.avg("__raw_seasonal").over(Window.partitionBy(*key_cols)),
    ).select(*key_cols, "__phase", "__seasonal")
    return (
        t.join(centered, [*key_cols, "__phase"], "left")
        .withColumn("trend", F.col("__trend"))
        .withColumn(
            "seasonal", F.when(F.col("__trend").isNotNull(), F.col("__seasonal"))
        )
        .withColumn("residual", F.col("__detrend") - F.col("__seasonal"))
        .drop("__trend", "__phase", "__detrend", "__seasonal")
    )


def gap_report(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    min_gap: str,
) -> DataFrame:
    """Outage/missing-interval report: every span between consecutive
    observations of a key that exceeds ``min_gap`` (e.g. ``'15
    minutes'``) — the monitoring companion to gap_fill_locf (which
    silently repairs what this makes visible).

    One window shuffle keyed by the series key (``lead`` over the time
    order), then a filter — no densification, so a year-long outage
    costs one output row, not a year of grid rows.

    Output: *keys, gap_start, gap_end, gap_seconds.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    nxt = F.lead(F.col(ts_col)).over(w)
    # NTZ timestamps have no direct long cast; the TIMESTAMP hop
    # reinterprets in session time (UTC everywhere in this engine)
    epoch = lambda c: F.col(c).cast("timestamp").cast("long")  # noqa: E731
    out = (
        df.select(*key_cols, F.col(ts_col).alias("gap_start"), nxt.alias("gap_end"))
        .withColumn("gap_seconds", epoch("gap_end") - epoch("gap_start"))
    )
    secs = _every_seconds_ts(min_gap)
    return out.filter(F.col("gap_seconds") > secs)


def _every_seconds_ts(every: str) -> int:
    """'15 minutes' / '2 hours' / '90 seconds' / '1 day' → seconds."""
    n, unit = every.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return int(n) * mult


def holt_smoothing(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Holt double-exponential smoothing per series: level ℓ_t =
    α·y_t + (1−α)(ℓ_{t−1} + b_t−1), trend b_t = β(ℓ_t − ℓ_{t−1}) +
    (1−β)b_{t−1}, fitted one-step-ahead ŷ_t = ℓ_{t−1} + b_{t−1} —
    the trend-aware upgrade to :func:`ewma` (which a coupled
    recurrence pair cannot express as a window power series).

    This is the sanctioned Pandas escape hatch (SURVEY §2B Q63): the
    recurrence is inherently sequential WITHIN a series, so each key
    group runs as one Arrow batch under ``applyInPandas`` while keys
    parallelize across executors — the same per-key-sequential shape
    as stateful streaming. One shuffle on the key; a numpy loop over
    the group, never a Python loop over Spark rows. Initialization:
    ℓ_0 = y_0, b_0 = y_1 − y_0 (0 for singleton series); fitted is
    NULL for the first observation. ``tie_cols`` break timestamp ties
    deterministically (like :func:`seasonal_decompose` /
    :func:`transition_matrix`) — without them, series with tied
    timestamps smooth in a layout-dependent order.

    Output: *keys, ts, value, level, trend, fitted.
    """
    import numpy as np
    import pandas as pd

    a, b = float(alpha), float(beta)
    if not (0 < a <= 1 and 0 <= b <= 1):
        raise ValueError("alpha in (0,1], beta in [0,1] required")
    ties = tie_cols or []

    schema = ", ".join(
        [f"`{k}` {df.schema[k].dataType.simpleString()}" for k in key_cols]
        + [
            f"`{ts_col}` {df.schema[ts_col].dataType.simpleString()}",
            f"`{value_col}` double",
            "level double",
            "trend double",
            "fitted double",
        ]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, *ties], kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=float)
        n = len(y)
        lvl = np.empty(n)
        trd = np.empty(n)
        fit = np.full(n, np.nan)
        lvl[0] = y[0]
        trd[0] = (y[1] - y[0]) if n > 1 else 0.0
        for i in range(1, n):
            fit[i] = lvl[i - 1] + trd[i - 1]
            lvl[i] = a * y[i] + (1 - a) * fit[i]
            trd[i] = b * (lvl[i] - lvl[i - 1]) + (1 - b) * trd[i - 1]
        out = pdf[[*key_cols, ts_col]].copy()
        out[value_col] = y
        out["level"] = lvl
        out["trend"] = trd
        out["fitted"] = fit
        return out

    return (
        df.select(
            *key_cols,
            ts_col,
            *ties,
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(*key_cols)
        .applyInPandas(smooth, schema=schema)
    )


def cusum_changepoints(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    threshold: float = 5.0,
    drift: float = 0.5,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point detection per series (Page, 1954):
    running sums S⁺ = max(0, S⁺ + z − drift), S⁻ = max(0, S⁻ − z −
    drift) over the standardized series; an alarm fires when either
    exceeds ``threshold``, then the accumulator resets — the classic
    mean-shift detector that complements the trailing z-score
    (:func:`detect_anomalies` flags POINTS; CUSUM flags sustained
    LEVEL SHIFTS a point test never trips on).

    The max(0, ·) recurrence is inherently sequential per series →
    ``applyInPandas`` (the sanctioned per-key-sequential escape hatch,
    like :func:`holt_smoothing`); z-scores standardize against the
    series' own mean/std (one in-group numpy pass). Keys parallelize
    across executors; one shuffle on the key. ``tie_cols`` break
    timestamp ties deterministically — the reset accumulator is
    order-sensitive, so tied timestamps otherwise give
    layout-dependent output.

    Output: *keys, ts, value, cusum_pos, cusum_neg, is_changepoint.
    """
    import numpy as np
    import pandas as pd

    th, dr = float(threshold), float(drift)
    ties = tie_cols or []

    schema = ", ".join(
        [f"`{k}` {df.schema[k].dataType.simpleString()}" for k in key_cols]
        + [
            f"`{ts_col}` {df.schema[ts_col].dataType.simpleString()}",
            f"`{value_col}` double",
            "cusum_pos double",
            "cusum_neg double",
            "is_changepoint boolean",
        ]
    )

    def detect(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, *ties], kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=float)
        mu = float(np.mean(y)) if len(y) else 0.0
        sd = float(np.std(y))
        z = (y - mu) / sd if sd > 0 else np.zeros_like(y)
        sp = np.zeros(len(y))
        sn = np.zeros(len(y))
        alarm = np.zeros(len(y), dtype=bool)
        cp, cn = 0.0, 0.0
        for i, zi in enumerate(z):
            cp = max(0.0, cp + zi - dr)
            cn = max(0.0, cn - zi - dr)
            sp[i], sn[i] = cp, cn
            if cp > th or cn > th:
                alarm[i] = True
                cp, cn = 0.0, 0.0
        out = pdf[[*key_cols, ts_col]].copy()
        out[value_col] = y
        out["cusum_pos"] = sp
        out["cusum_neg"] = sn
        out["is_changepoint"] = alarm
        return out

    return (
        df.select(
            *key_cols,
            ts_col,
            *ties,
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(*key_cols)
        .applyInPandas(detect, schema=schema)
    )


def ljung_box(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    max_lag: int = 5,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Ljung-Box portmanteau test: Q = n(n+2)·Σ_{k≤m} ρ̂ₖ²/(n−k) over
    the first m STANDARD autocorrelations (fixed series mean, full
    Σ(x−x̄)² denominator — the Box-Jenkins convention, which differs
    from :func:`autocorrelation`'s corr-of-lagged-pairs) — the "is
    this residual series white noise" gate run after any forecast /
    detrending step; Q ~ χ²(m) under independence (Ljung & Box 1978,
    Biometrika 65:297).

    One window pass builds all m lag columns under the shared per-key
    ordering; ONE aggregate then folds, per key, the raw moments
    (Σx, Σx², n, and per lag Σx·x₋ₖ, the pair-restricted Σx / Σx₋ₖ and
    pair count), from which each ρ̂ₖ = (Σxx₋ₖ − x̄(Σxₚ+Σx₋ₖₚ) + cₖx̄²)
    / (Σx² − nx̄²) is a closed-form select expression — m lags cost
    one shuffle + one agg, never m jobs, and the per-key frame the
    window sorts is the series itself (the ACF scale shape).

    Output: (*keys, n, acf_1..acf_m, q_stat, dof); q_stat NULL when
    the series is constant (zero variance) or shorter than max_lag+1.
    """
    ls = list(range(1, max_lag + 1))
    order = [ts_col, *(tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    x = F.col(value_col).cast("double")
    cur = df
    for k in ls:
        cur = cur.withColumn(f"__lag{k}", F.lag(x, k).over(w))
    aggs = [
        F.count(x).alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(x * x).alias("__sxx"),
    ]
    for k in ls:
        lg = F.col(f"__lag{k}")
        pair = lg.isNotNull()
        aggs += [
            F.sum(F.when(pair, x * lg)).alias(f"__sxy{k}"),
            F.sum(F.when(pair, x)).alias(f"__sxp{k}"),
            F.sum(F.when(pair, lg)).alias(f"__syp{k}"),
            F.sum(pair.cast("long")).alias(f"__c{k}"),
        ]
    g = cur.groupBy(*key_cols).agg(*aggs)
    n = F.col("__n").cast("double")
    mean = F.col("__sx") / n
    denom = F.col("__sxx") - n * mean * mean
    rhos = {
        k: (
            F.col(f"__sxy{k}")
            - mean * (F.col(f"__sxp{k}") + F.col(f"__syp{k}"))
            + F.col(f"__c{k}").cast("double") * mean * mean
        )
        / denom
        for k in ls
    }
    q = n * (n + 2.0) * sum(
        rhos[k] * rhos[k] / (n - F.lit(float(k))) for k in ls
    )
    ok = (denom > 0) & (F.col("__n") > max_lag)
    return g.select(
        *key_cols,
        F.col("__n").alias("n"),
        *[
            F.when(ok, rhos[k]).alias(f"acf_{k}")
            for k in ls
        ],
        F.when(ok, q).alias("q_stat"),
        F.lit(max_lag).alias("dof"),
    )


def cross_correlation(
    aligned: DataFrame,
    date_col: str,
    x_col: str,
    y_col: str,
    max_lag: int,
) -> DataFrame:
    """Cross-correlation function (CCF) between two daily series: the
    Pearson correlation of (x_t, y_{t+k}) for each lead k = 0..max_lag
    — "does today's x predict y k days later?", the lead-lag audit
    between an upstream and a downstream metric.

    Input is the ALIGNED frame (one row per date with both values —
    build it with a full-outer date join, zero-filling each side);
    pairs whose t+k is absent from the grid drop (pairwise-complete
    CCF), so n varies by lag and is reported.

    Exactness: integer-valued series (counts) fold every moment in
    DECIMAL(38,0); r_k is one double expression per lag — the q266
    integer-moments discipline, quadratically restatable.

    Scale shape: the lag fan-out is ``explode(sequence(0, L))`` on the
    DAILY frame (K rows × L lags, never the facts), one self-join on
    the shifted date, one hash aggregate per lag — all map-side
    partial. Output: (lag, n, ccf), ccf NULL where either window
    variance is zero.
    """
    base = aligned.select(
        F.col(date_col).alias("d"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    lags = base.select(
        "d",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(max_lag))).alias("lag"),
    )
    shifted = base.select(
        F.col("d").alias("d2"), F.col("y").alias("y2")
    )
    pairs = lags.join(
        shifted, F.date_add(F.col("d"), F.col("lag")) == F.col("d2")
    )
    dec = "decimal(38,0)"
    m = pairs.groupBy("lag").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y2").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y2")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y2").cast(dec) * F.col("y2")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = (n * F.col("sxy") - sx * sy).cast("double")
    vx = (n * F.col("sxx") - sx * sx).cast("double")
    vy = (n * F.col("syy") - sy * sy).cast("double")
    return m.select(
        F.col("lag").cast("int").alias("lag"),
        n.cast("long").alias("n"),
        F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)).alias("ccf"),
    )


def rolling_origin_splits(
    df: DataFrame,
    ts_col: str,
    n_folds: int,
    horizon: int,
    every: str = "1 day",
) -> DataFrame:
    """Rolling-origin evaluation splits (time-series cross-validation,
    Tashman 2000): ``n_folds`` expanding-window train/test assignments
    over the bucketed time axis — fold i trains on everything up to
    cutoff_i and tests on the next ``horizon`` buckets, with cutoffs
    spaced so the LAST fold's test window ends at the series end.
    Random K-fold leaks the future into training; this is the split
    discipline forecasting evaluation requires.

    The time axis is bucketed map-side (``F.window``), the distinct
    bucket frame is tiny (K buckets), and the fold assignment is a
    bucket-grid × fold-grid join back onto buckets — rows join their
    bucket, the facts are scanned once. Output: one row per (fold,
    role, bucket) with the bucketed row count — the manifest a
    backtest loop (q244's pinball scorer, q233's monitors) consumes.

    Raises when the series has fewer buckets than ``n_folds`` +
    ``horizon`` demands.
    """
    bucketed = df.select(
        F.window(F.col(ts_col), every).getField("start").alias("bucket")
    )
    counts = bucketed.groupBy("bucket").agg(F.count("*").alias("n_rows"))
    from pyspark.sql import Window

    w = Window.orderBy("bucket")
    idx = counts.withColumn("i", F.row_number().over(w) - 1)
    total = idx.count()
    need = n_folds + horizon
    if total < need:
        raise ValueError(
            f"series has {total} buckets; need >= {need} "
            f"(n_folds={n_folds} + horizon={horizon})"
        )
    # cutoffs: last fold tests the final `horizon` buckets; folds step
    # back one bucket each — deterministic integer arithmetic
    last_cut = total - horizon - 1
    first_cut = last_cut - (n_folds - 1)
    folds = df.sparkSession.range(n_folds).select(
        F.col("id").cast("int").alias("fold"),
        (F.lit(first_cut) + F.col("id")).alias("cut"),
    )
    assigned = idx.crossJoin(F.broadcast(folds)).select(
        "fold",
        F.when(F.col("i") <= F.col("cut"), F.lit("train"))
        .when(
            F.col("i") <= F.col("cut") + horizon, F.lit("test")
        )
        .alias("role"),
        "bucket",
        "n_rows",
    )
    return assigned.filter(F.col("role").isNotNull())


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Maximum number of simultaneously-open intervals per group — the
    sweep-line answer to "peak concurrent sessions / in-flight
    shipments / admitted patients" that gaps-and-islands does not
    give.  Intervals are half-open ``[start, end)`` (an interval
    ending exactly when another starts does NOT overlap it — the
    convention that makes back-to-back sessions count once).

    Plan: ± deltas unioned map-side, then ONE hash aggregate nets the
    deltas per (group, timestamp) — so the window below runs over the
    DISTINCT-timestamp frame, not raw rows — and one running-sum
    window keyed by the group computes concurrency after each
    timestamp.  A single shuffle on the group key; groups are the
    parallel unit (an unbounded single-group sweep is the documented
    adversarial case — pre-bucket by coarse time and merge, the q184
    contribution-explode posture).  NULL starts/ends are dropped
    (open-ended intervals need an explicit sentinel end, not NULL);
    rows with ``end <= start`` raise at action time rather than
    silently vanishing.

    Output: one row per group — (…group_cols, peak, peak_at) where
    ``peak_at`` is the EARLIEST timestamp reaching the peak
    (deterministic: the netted frame has one row per timestamp).
    """
    from pyspark.sql import Window

    groups = list(group_cols or [])
    s, e = F.col(start_col), F.col(end_col)
    base = df.filter(s.isNotNull() & e.isNotNull())
    starts = base.select(*groups, s.alias("__t"), F.lit(1).alias("__d"))
    ends = base.select(*groups, e.alias("__t"), F.lit(-1).alias("__d"))
    netted = (
        starts.unionByName(ends)
        .groupBy(*groups, "__t")
        .agg(F.sum("__d").alias("__net"))
    )
    w = (
        Window.partitionBy(*groups).orderBy("__t")
        if groups
        else Window.partitionBy(F.lit(1)).orderBy("__t")
    )
    running = netted.withColumn(
        "__c", F.sum("__net").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    peak = running.groupBy(*groups).agg(
        F.max("__c").cast("int").alias("peak")
    )
    at = (
        running.join(peak, groups, "inner")
        if groups
        else running.crossJoin(F.broadcast(peak))
    )
    out = (
        at.filter(F.col("__c") == F.col("peak"))
        .groupBy(*groups, "peak")
        .agg(F.min("__t").alias("peak_at"))
    )
    # end<=start contract: rides the peak column so it raises at action
    # time on the single output frame (the proportions_ztest pattern)
    bad_count = base.filter(e <= s).agg(F.count("*").alias("__nbad"))
    return out.join(F.broadcast(bad_count)).select(
        *groups,
        F.when(
            F.col("__nbad") > 0,
            F.raise_error(
                F.lit(
                    "peak_concurrency: end <= start rows present — "
                    "intervals are half-open [start, end); fix or "
                    "filter them explicitly"
                )
            ).cast("int"),
        )
        .otherwise(F.col("peak"))
        .alias("peak"),
        "peak_at",
    )


def holt_winters_seasonal(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    period: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    tie_cols: list[str] | None = None,
    seasonal: str = "add",
    phi: float = 1.0,
) -> DataFrame:
    """Holt–Winters triple-exponential smoothing per series — the
    seasonal members completing the family (:func:`ewma` level,
    :func:`holt_smoothing` level+trend).

    ADDITIVE (default, the r12 member): level ℓ_t = α(y_t − s_{t−p})
    + (1−α)(ℓ_{t−1} + φb_{t−1}), trend b_t = β(ℓ_t − ℓ_{t−1}) +
    (1−β)φb_{t−1}, season s_t = γ(y_t − ℓ_t) + (1−γ)s_{t−p}, fitted
    ŷ_t = ℓ_{t−1} + φb_{t−1} + s_{t−p}.

    MULTIPLICATIVE (``seasonal="mul"``, r13): seasonal factors scale
    instead of shift — ℓ_t = α(y_t / s_{t−p}) + (1−α)(ℓ_{t−1} +
    φb_{t−1}), s_t = γ(y_t / ℓ_t) + (1−γ)s_{t−p}, ŷ_t = (ℓ_{t−1} +
    φb_{t−1})·s_{t−p}; requires a strictly positive series (raises
    otherwise — a multiplicative fit through zero is undefined).

    DAMPED TREND (``phi`` in (0, 1], r13): φ < 1 flattens the trend
    toward a horizontal asymptote (Gardner–McKenzie); φ = 1 is the
    classic undamped recurrence. Orthogonal to the seasonal mode.

    Same sanctioned applyInPandas shape as Holt (the coupled
    recurrences are sequential within a series; keys are the parallel
    unit; one shuffle on the key).  Initialization is the standard
    first-cycle convention: ℓ_{p−1} = mean(y_0..y_{p−1}), b_{p−1} =
    (mean of second cycle − mean of first)/p when a second full cycle
    exists else 0, s_i = y_i − ℓ_{p−1} (additive) or y_i / ℓ_{p−1}
    (multiplicative) for the first cycle; fitted is NULL through the
    first cycle.  Series shorter than one full period raise (a
    seasonal fit on less than one season is undefined, not zero).
    ``tie_cols`` break timestamp ties deterministically, as in
    :func:`holt_smoothing`.

    Rows-only by design (coupled level/trend/season not
    oracle-portable); each variant verified against an independent
    reference recurrence in tests.  Output: *keys, ts, value, level,
    trend, season, fitted.
    """
    import numpy as np
    import pandas as pd

    a, b, g = float(alpha), float(beta), float(gamma)
    ph = float(phi)
    p = int(period)
    if p < 2:
        raise ValueError("period must be >= 2")
    if not (0 < a <= 1 and 0 <= b <= 1 and 0 <= g <= 1):
        raise ValueError("alpha in (0,1], beta/gamma in [0,1] required")
    if not 0 < ph <= 1:
        raise ValueError("phi (trend damping) must be in (0, 1]")
    if seasonal not in ("add", "mul"):
        raise ValueError("seasonal must be 'add' or 'mul'")
    mul = seasonal == "mul"
    ties = tie_cols or []

    schema = ", ".join(
        [f"`{k}` {df.schema[k].dataType.simpleString()}" for k in key_cols]
        + [
            f"`{ts_col}` {df.schema[ts_col].dataType.simpleString()}",
            f"`{value_col}` double",
            "level double",
            "trend double",
            "season double",
            "fitted double",
        ]
    )

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, *ties], kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=float)
        n = len(y)
        if n < p:
            raise ValueError(
                f"holt_winters_seasonal: series of length {n} is shorter "
                f"than one period ({p})"
            )
        if mul and (y <= 0).any():
            raise ValueError(
                "holt_winters_seasonal: multiplicative seasonality "
                "requires a strictly positive series"
            )
        lvl = np.full(n, np.nan)
        trd = np.full(n, np.nan)
        ssn = np.full(n, np.nan)
        fit = np.full(n, np.nan)
        l0 = float(y[:p].mean())
        if n >= 2 * p:
            b0 = float((y[p : 2 * p].mean() - y[:p].mean()) / p)
        else:
            b0 = 0.0
        ssn[:p] = (y[:p] / l0) if mul else (y[:p] - l0)
        lvl[p - 1] = l0
        trd[p - 1] = b0
        for i in range(p, n):
            prev = lvl[i - 1] + ph * trd[i - 1]
            if mul:
                fit[i] = prev * ssn[i - p]
                lvl[i] = a * (y[i] / ssn[i - p]) + (1 - a) * prev
                trd[i] = b * (lvl[i] - lvl[i - 1]) + (1 - b) * ph * trd[i - 1]
                ssn[i] = g * (y[i] / lvl[i]) + (1 - g) * ssn[i - p]
            else:
                fit[i] = prev + ssn[i - p]
                lvl[i] = a * (y[i] - ssn[i - p]) + (1 - a) * prev
                trd[i] = b * (lvl[i] - lvl[i - 1]) + (1 - b) * ph * trd[i - 1]
                ssn[i] = g * (y[i] - lvl[i]) + (1 - g) * ssn[i - p]
        out = pdf[[*key_cols, ts_col]].copy()
        out[value_col] = y
        out["level"] = lvl
        out["trend"] = trd
        out["season"] = ssn
        out["fitted"] = fit
        return out

    return (
        df.select(
            *key_cols,
            *ties,
            ts_col,
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(*key_cols)
        .applyInPandas(smooth, schema=schema)
    )


def kalman_local_level(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    q: float = 1.0,
    r: float = 4.0,
    p0: float | None = None,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Kalman filter + RTS smoother per series for the LOCAL-LEVEL
    model (r14 wave 6; Durbin & Koopman §2 — the canonical
    state-space smoother sensor/metric pipelines reach for when EWMA's
    fixed gain is wrong): state x_t = x_{t−1} + w_t (variance ``q``),
    observation y_t = x_t + v_t (variance ``r``). Forward pass per t:
    predict (m⁻ = m, P⁻ = P + q), gain K = P⁻/(P⁻ + r), update; the
    backward Rauch-Tung-Striebel pass refines every estimate with the
    information that arrived after it. Unlike EWMA the gain ADAPTS:
    early observations get high K (uncertain state), the steady state
    settles at the optimal signal-to-noise gain.

    Initialization is explicit and deterministic: m_{0|0} = y_0,
    P_{0|0} = ``p0`` (default ``r``). Same sanctioned applyInPandas
    shape as :func:`holt_smoothing` — the recurrence is sequential
    WITHIN a series, keys parallelize across executors, one shuffle
    on the key. ``tie_cols`` break timestamp ties deterministically.

    Output: *keys, ts, value, filtered, variance, gain, smoothed.
    """
    import numpy as np
    import pandas as pd

    qv, rv = float(q), float(r)
    if qv <= 0 or rv <= 0:
        raise ValueError("q and r must be > 0")
    pv = rv if p0 is None else float(p0)
    if pv <= 0:
        raise ValueError("p0 must be > 0")
    ties = tie_cols or []

    schema = ", ".join(
        [f"`{k}` {df.schema[k].dataType.simpleString()}" for k in key_cols]
        + [
            f"`{ts_col}` {df.schema[ts_col].dataType.simpleString()}",
            f"`{value_col}` double",
            "filtered double",
            "variance double",
            "gain double",
            "smoothed double",
        ]
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, *ties], kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=float)
        n = len(y)
        m = np.empty(n)
        P = np.empty(n)
        Ppred = np.empty(n)  # P_{t|t-1}, for the RTS gain
        K = np.empty(n)
        m[0], P[0] = y[0], pv
        Ppred[0] = pv
        K[0] = np.nan  # no update happened at t=0 (direct init)
        for t in range(1, n):
            mp = m[t - 1]
            Pp = P[t - 1] + qv
            Ppred[t] = Pp
            k = Pp / (Pp + rv)
            K[t] = k
            m[t] = mp + k * (y[t] - mp)
            P[t] = (1.0 - k) * Pp
        ms = m.copy()
        for t in range(n - 2, -1, -1):
            c = P[t] / Ppred[t + 1]
            ms[t] = m[t] + c * (ms[t + 1] - m[t])
        out = pdf[[*key_cols, ts_col]].copy()
        out[value_col] = y
        out["filtered"] = m
        out["variance"] = P
        out["gain"] = K
        out["smoothed"] = ms
        return out

    return (
        df.select(
            *key_cols,
            ts_col,
            *ties,
            F.col(value_col).cast("double").alias(value_col),
        )
        .groupBy(*key_cols)
        .applyInPandas(run, schema=schema)
    )
