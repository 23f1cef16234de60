"""MERGE-upsert / CDC-fold / SCD2 operator tests."""

from pyspark.sql import functions as F

from parquet_on_fhir_spark.operators.upsert import (
    fold_cdc_latest,
    merge_upsert,
    scd2_apply,
)


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k INT, name STRING, v DOUBLE"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 22.0), (4, "d", 40.0)], "k INT, name STRING, v DOUBLE"
    )
    merged = merge_upsert(target, updates, ["k"])
    got = {r.k: (r.name, r.v) for r in merged.collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 22.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_fold_cdc_latest_with_deletes(spark):
    changes = spark.createDataFrame(
        [
            (1, 1, "v1", False),
            (1, 3, "v3", False),
            (1, 2, "v2", False),
            (2, 1, "x1", False),
            (2, 2, None, True),   # tombstone
            (3, 5, "y5", False),
        ],
        "k INT, seq INT, payload STRING, deleted BOOLEAN",
    )
    latest = fold_cdc_latest(changes, ["k"], "seq", delete_col="deleted")
    got = {r.k: r.payload for r in latest.collect()}
    assert got == {1: "v3", 3: "y5"}  # key 2 deleted


def test_scd2_versions(spark):
    current = spark.createDataFrame(
        [
            (1, "seg_a", "2020-01-01", "2021-01-01"),
            (1, "seg_b", "2021-01-01", None),
            (2, "seg_x", "2020-06-01", None),
        ],
        "k INT, segment STRING, valid_from STRING, valid_to STRING",
    )
    updates = spark.createDataFrame(
        [(1, "seg_c", "2022-03-01"), (3, "seg_new", "2022-01-01")],
        "k INT, segment STRING, eff STRING",
    )
    hist = scd2_apply(current, updates, ["k"], "eff")
    rows = sorted(
        (r.k, r.segment, r.valid_from, r.valid_to) for r in hist.collect()
    )
    assert rows == [
        (1, "seg_a", "2020-01-01", "2021-01-01"),
        (1, "seg_b", "2021-01-01", "2022-03-01"),  # closed by the update
        (1, "seg_c", "2022-03-01", None),          # new open version
        (2, "seg_x", "2020-06-01", None),
        (3, "seg_new", "2022-01-01", None),
    ]
    # idempotent under replay of the same updates
    hist2 = scd2_apply(hist.drop("valid_to"), updates, ["k"], "eff")
    assert sorted(
        (r.k, r.segment, r.valid_from, r.valid_to) for r in hist2.collect()
    ) == rows


def test_fold_cdc_latest_tie_determinism(spark):
    """Equal seq values must fold to the same survivor on every replay /
    partitioning: desc struct order over non-key columns (ADVICE r1)."""
    from parquet_on_fhir_spark.operators.upsert import fold_cdc_latest

    rows = [("k", 1, "a"), ("k", 1, "z"), ("k", 1, "m")]
    expected = [("k", 1, "z")]  # greatest struct(payload)
    for parts in (1, 3, 7):
        df = spark.createDataFrame(rows, "key string, seq int, payload string") \
            .repartition(parts)
        got = [tuple(r) for r in fold_cdc_latest(df, ["key"], "seq").collect()]
        assert got == expected
