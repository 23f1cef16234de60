"""Window function queries (SURVEY.md §2B Q30-Q33).

Window determinism discipline: every ORDER BY in a window that feeds
row_number/lag/lead/frames ends with a unique key so both engines pick
identical rows; rank/dense_rank rank only on the stated keys (ties get
equal ranks in both engines, which is deterministic).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from parquet_on_fhir_spark.suite.common import Q, d2, d4, t, ts_str


# --- Q30: ranking functions -------------------------------------------------
def q30(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w_unique = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_ties = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_unique).alias("rn"),
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_unique).alias("quartile"),
        d4(F.percent_rank().over(w_unique)).alias("pct_rank"),
    )


Q30_ORACLE = """
SELECT o_custkey, o_orderkey,
       row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
       round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) + 1e-9, 4) AS pct_rank
FROM orders
"""


# --- Q31: lag / lead / first / last over window --------------------------------
def q31(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return e.select(
        "user_id",
        "event_id",
        d4(F.lag("value", 1).over(w)).alias("prev_value"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.first("event_id").over(w_frame).alias("first_event"),
        F.last("event_id").over(w_frame).alias("last_event"),
    )


Q31_ORACLE = """
SELECT user_id, event_id,
       round(lag(value, 1) OVER w + 1e-9, 4) AS prev_value,
       lead(event_type, 1) OVER w AS next_type,
       first_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
       last_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# --- Q32: windowed aggregates with frames (running sum, moving avg) -------------
def q32(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    moving = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        d2(F.sum("o_totalprice").over(running)).alias("running_total"),
        d4(F.avg("o_totalprice").over(moving)).alias("moving_avg_3"),
        F.count("*").over(running).alias("order_seq"),
    )


Q32_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(avg(o_totalprice) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS moving_avg_3,
       count(*) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS order_seq
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --- Q33: top-k per group ---------------------------------------------------------
def q33(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_orderstatus", "o_orderkey", d2(F.col("o_totalprice")).alias("price"), "rn"
        )
    )


Q33_ORACLE = """
SELECT o_orderstatus, o_orderkey, round(o_totalprice, 2) AS price,
       row_number() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 3
"""


QUERIES = [
    Q("q30_window_ranking", q30, Q30_ORACLE),
    Q("q31_window_lag_lead", q31, Q31_ORACLE),
    Q("q32_window_frames", q32, Q32_ORACLE),
    Q("q33_window_topk_per_group", q33, Q33_ORACLE),
]


# --- Q154: time-RANGE window frame (trailing 1 hour per event) ----------------------
def q154(spark, sf_dir):
    """Per event: how many of the same user's events landed in the
    trailing hour, and their value sum — a RANGE frame over the
    microsecond epoch (rangeBetween is value-based, so equal-timestamp
    rows share one frame and the result is tie-order independent,
    unlike a ROWS frame). The sliding-window rate-limit / velocity
    feature every fraud pipeline computes.

    Scale: one shuffle on user_id; the range frame is evaluated with a
    single sort per partition — no self-join (the naive formulation
    joins events×events on a time band, quadratic in hot users).
    """
    e = t(spark, sf_dir, "events")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ → TS (UTC session)
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_1h"),
        d2(F.sum("value").over(w)).alias("sum_1h"),
    )


Q154_ORACLE = """
SELECT event_id, user_id,
       count(*) OVER w AS n_1h,
       round(sum(value) OVER w, 2) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


QUERIES.append(Q("q154_rolling_time_range", q154, Q154_ORACLE))
