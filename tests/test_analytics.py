"""Funnel / cohort-retention / expectations operator tests."""

from datetime import datetime

from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators.analytics import cohort_retention, funnel


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_enforces_order(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        # u1 completes all three in order
        (1, datetime(2024, 1, 1, 0), "view"),
        (1, datetime(2024, 1, 1, 1), "click"),
        (1, datetime(2024, 1, 1, 2), "purchase"),
        # u2: click BEFORE the first view — click must not count
        (2, datetime(2024, 1, 1, 0), "click"),
        (2, datetime(2024, 1, 1, 1), "view"),
        # u3: never views — not in the funnel at all
        (3, datetime(2024, 1, 1, 0), "purchase"),
        # u4: view then purchase, no click — purchase must not count
        (4, datetime(2024, 1, 1, 0), "view"),
        (4, datetime(2024, 1, 1, 1), "purchase"),
    ]
    out = {r.user_id: r for r in funnel(
        _ev(spark, rows),
        [("view", F.col("event_type") == "view"),
         ("click", F.col("event_type") == "click"),
         ("purchase", F.col("event_type") == "purchase")],
    ).collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].furthest_step == 3
    assert out[2].furthest_step == 1 and out[2].t_click is None
    assert out[4].furthest_step == 1 and out[4].t_purchase is None


def test_cohort_retention_offsets(spark):
    rows = [
        (1, datetime(2024, 1, 1), "view"),    # cohort week 0
        (1, datetime(2024, 1, 9), "view"),    # active week 1
        (1, datetime(2024, 1, 16), "view"),   # active week 2
        (2, datetime(2024, 1, 2), "view"),    # same cohort week
        (3, datetime(2024, 1, 9), "view"),    # later cohort
    ]
    out = {(str(r.cohort), r.period_offset): r.n_users
           for r in cohort_retention(_ev(spark, rows), "1 week").collect()}
    # offsets 0/1/2 for the first cohort; cohort sizes at offset 0
    offsets = sorted(k[1] for k in out)
    assert offsets == [0, 0, 1, 2]
    zero_counts = sorted(v for k, v in out.items() if k[1] == 0)
    assert zero_counts == [1, 2]
    assert all(v >= 1 for v in out.values())


def test_check_expectations_single_pass(spark):
    from parquet_on_fhir_spark.operators.text import check_expectations

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "c")], "id long, s string"
    )
    out = {r.rule: r for r in check_expectations(df, {
        "id_set": F.col("id").isNotNull(),
        "s_set": F.col("s").isNotNull(),
        "always": F.lit(True),
    }).collect()}
    assert out["id_set"].n_violations == 1 and not out["id_set"].ok
    assert out["s_set"].n_violations == 1
    assert out["always"].n_violations == 0 and out["always"].ok
    assert all(r.n_rows == 3 for r in out.values())
    assert abs(out["id_set"].pass_rate - 2 / 3) < 1e-9
