"""SparkSession factory tuned for this engine.

Scale posture: these configs are the local-mode projection of the
settings we would run on a 1000-executor cluster against ~100 TB —
AQE on (runtime re-planning, skew-join splitting, partition
coalescing), shuffle partitions sized to the parallelism at hand,
UTC session time so results are byte-comparable across engines, and
Arrow for any pandas exchange.
"""

from __future__ import annotations

import os
from pathlib import Path

from pyspark.sql import SparkSession

# Catalyst extension jar (annotation-aware predicate rewrite, SURVEY
# §4.1 v2 — built by tools/build_jvm_ext.py and committed). Wired only
# when present; SPARK_GRAFT_NO_EXT=1 is the kill switch. If the JVM was
# already launched without the jar, Spark logs a warning and builds the
# session without the extension — never fatal.
_EXT_JAR = Path(__file__).resolve().parent / "jvm" / "pofs-catalyst-ext.jar"
_EXT_CLASS = "org.pofs.spark.FhirAnnotationExtensions"


def get_session(app_name: str = "parquet-on-fhir-spark") -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
        # ones, convert sort-merge joins to broadcast when a side turns out
        # small. Essential at 100 TB, free at sf0.01.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Local: ~1 shuffle partition per core. On a cluster this would be
        # sized to (input bytes / 128MB) and then AQE-coalesced.
        .config(
            "spark.sql.shuffle.partitions",
            cpus if cpus not in ("*", "") else str(os.cpu_count() or 8),
        )
        # Deterministic timestamps vs the DuckDB oracle (naive-UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for pandas UDF / toPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if _EXT_JAR.exists() and os.environ.get("SPARK_GRAFT_NO_EXT") != "1":
        # extraClassPath (not spark.jars): pyspark forwards builder
        # configs onto the spark-submit launch command, so the jar is
        # on the JVM classpath from the start — spark.jars instead
        # registers an added-jar that every TASK re-checks
        # (updateDependencies), a measurable per-task tax on a
        # many-small-stage workload (~8% on the bench suite).
        builder = (
            builder.config("spark.driver.extraClassPath", str(_EXT_JAR))
            .config("spark.executor.extraClassPath", str(_EXT_JAR))
            .config("spark.sql.extensions", _EXT_CLASS)
        )
    return builder.getOrCreate()


def local_rows_df(spark: SparkSession, rows, schema, slices: int = 1):
    """Small-literal DataFrame with a sane partition count (r16,
    guide §4/§6). ``spark.createDataFrame(list)`` parallelizes the
    rows over ``defaultParallelism`` partitions (32 on the local
    session), and because the backing RDD holds PYTHON-pickled rows,
    EVERY scan of the frame — each broadcast build, each action —
    pays one Python-worker deserialization round-trip per partition:
    ~0.5 s per scan for a 4-row frame, almost all of it empty-task
    boundary cost (measured: 0.53 s → 0.26 s for a 4-row count at
    ``slices=1``). Fixture/metadata frames are a handful of rows by
    construction, so one slice is their right layout; pass a larger
    ``slices`` only when the literal data is genuinely big."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, slices), schema
    )


def utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (idempotent, runtime-settable).

    Called at the top of every query so results are comparable with the
    DuckDB oracle regardless of who built the session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
