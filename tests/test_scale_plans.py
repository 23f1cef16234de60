"""Scale-posture tests: assert the PLANS, not just the results —
bucketed joins are exchange-free, broadcasts happen, pushdown reaches
the scan, salted joins match plain joins."""

import tempfile

from pyspark.sql import functions as F

from parquet_on_fhir_spark.api import load_table
from parquet_on_fhir_spark.operators.bucketing import (
    bucketed_join,
    plan_of,
    write_bucketed,
)
from parquet_on_fhir_spark.operators.skew import salted_join


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    write_bucketed(c, "b_customer", "c_custkey", buckets=4)
    write_bucketed(o, "b_orders", "c_custkey", buckets=4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_customer", "c_custkey")
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        expect = (
            load_table(spark, sf_dir, "orders")
            .join(c, F.col("o_custkey") == c["c_custkey"])
            .count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_customer")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salted_join_equals_plain_join(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    salted = salted_join(l, p, "p_partkey").groupBy("p_brand").count()
    plain = l.join(p, "p_partkey").groupBy("p_brand").count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_broadcast_hint_respected(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    plan = plan_of(l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"]))
    assert "BroadcastHashJoin" in plan


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    plan = plan_of(
        l.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") < 5)
    )
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and "LessThan(l_quantity" in pushed[0]
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    # column pruning: only the two projected columns are read
    assert "l_extendedprice" not in read


def test_foreach_batch_sink(spark, sf_dir):
    from parquet_on_fhir_spark.streaming.jobs import (
        run_foreach_batch_to_parquet,
        stream_events,
    )

    out = tempfile.mkdtemp(prefix="pofs_fb_")
    s = stream_events(spark, sf_dir).select("event_id", "event_type")
    run_foreach_batch_to_parquet(s, out)
    back = spark.read.parquet(f"{out}/batch=*")
    assert back.count() == load_table(spark, sf_dir, "events").count()
