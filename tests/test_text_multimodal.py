"""Text-analysis and multimodal operator tests."""

from pyspark.sql import functions as F

from parquet_on_fhir_spark.api import load_table
from parquet_on_fhir_spark.operators import text as tx
from parquet_on_fhir_spark.operators.multimodal import (
    attach_binary,
    extract_features,
    frame_sample_plan,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world foo",), ("one",), ("a b c d e",)], "text string"
    )
    got = [r[0] for r in df.select(tx.token_count("text")).collect()]
    assert got == [3, 1, 5]


def test_bpe_ish_token_count_monotone_in_length(spark):
    df = spark.createDataFrame(
        [("short text",), ("a considerably longer sentence with many more words here",)],
        "text string",
    )
    a, b = [r[0] for r in df.select(tx.bpe_ish_token_count("text")).collect()]
    assert b > a > 0


def test_language_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in that house", "en"),
            ("el perro y la casa de los gatos en un pueblo", "es"),
            ("der Hund und die Katze ist nicht ein Tier zu Hause", "de"),
            ("xyzzy qwerty plugh", "und"),
        ],
        "text string, expect string",
    )
    rows = df.select("expect", tx.detect_language("text").alias("got")).collect()
    for r in rows:
        assert r.got == r.expect, r


def test_quality_score_ranges(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    scores = d.select(tx.quality_score("text").alias("q"))
    assert scores.filter((F.col("q") < 0) | (F.col("q") > 1)).count() == 0


def test_rolling_fingerprint_stable_under_tail_edit(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    df = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "completely different words here entirely")],
        "id int, text string",
    )
    rows = {r.id: r.fp for r in df.select("id", tx.rolling_fingerprint("text").alias("fp")).collect()}
    assert rows[1] == rows[2]  # min-window hash survives a tail append
    assert rows[1] != rows[3]


def test_multimodal_feature_extraction_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    media = attach_binary(d, "text", kind="blob")
    assert dict(media.dtypes)["content"] == "binary"
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feat) == 5 for r in rows)
    assert all(r.n_bytes > 0 for r in rows)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame(
        [(1, 3500), (2, 500)], "media_id int, duration bigint"
    ).select(
        "media_id",
        F.struct(
            F.lit("video/mp4").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.col("duration").alias("duration_ms"),
        ).alias("meta"),
    )
    plan = frame_sample_plan(df, every_ms=1000)
    got = sorted((r.media_id, r.frame_ts_ms) for r in plan.collect())
    assert got == [(1, 0), (1, 1000), (1, 2000), (2, 0)]


def test_decode_real_is_stubbed():
    import pytest

    from parquet_on_fhir_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"bytes", "image/png")
