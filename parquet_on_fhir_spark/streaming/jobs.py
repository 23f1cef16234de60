"""Streaming run helpers: file-stream sources over the test tables and
a run-to-completion harness (AvailableNow trigger + memory sink).

At production scale the source would be Kafka/files-on-object-store and
the sink a Delta/parquet table with checkpointing; the query graphs are
identical — only ``format(...)`` changes.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COUNTER = itertools.count()
_SRC_CACHE: dict[str, str] = {}


def _ckpt_dir() -> str:
    """Checkpoint scratch dir. Micro-batch latency at toy scale is
    dominated by state-store/commit-log fsyncs; a memory-backed tmpfs
    (when the host has one) removes that fixed cost without touching
    query semantics. Production checkpoints belong on durable storage —
    this helper is for run-to-completion test/bench streams whose
    checkpoints are discarded."""
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    return tempfile.mkdtemp(prefix="pofs_ckpt_", dir=base)

EVENTS_LONG_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``events`` as a file-stream source.

    The parquet stores TIMESTAMP(NANOS) (unreadable by Spark's row
    converter), so the stream schema takes nanos as LongType and converts
    to a microsecond timestamp JVM-side — same normalization as the batch
    loader (api.load_table).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = _SRC_CACHE.get(sf_dir)
    if src is None:
        # one staged copy per sf_dir per process (the file-stream source
        # needs a directory it owns; the copy itself is immutable)
        src = tempfile.mkdtemp(prefix="pofs_stream_src_")
        shutil.copy(f"{sf_dir}/events.parquet", src)
        _SRC_CACHE[sf_dir] = src
    sdf = spark.readStream.schema(EVENTS_LONG_SCHEMA).parquet(src)
    return sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_foreach_batch_to_parquet(df: DataFrame, out_dir: str) -> None:
    """Exactly-once-style file sink via ``foreachBatch``: each micro-batch
    lands in a batch-id-named subdirectory, so retries overwrite their own
    directory instead of duplicating rows (the idempotent-sink pattern
    from the guide; a real deployment would use a transactional table
    format instead)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    ck = _ckpt_dir()
    q = (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(
    df: DataFrame, output_mode: str = "complete", state_partitions: int | None = 8
) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a
    uniquely-named memory sink; return the sink contents as a batch DF.

    ``state_partitions`` right-sizes the stream's shuffle/state-store
    partition count for toy-scale runs (each state partition costs a
    store instance + per-batch commit files; 32 of them dominate a
    sub-second micro-batch). The stream pins its own partitioning at
    start, so the session conf is restored immediately after. Pass None
    to inherit the session value (what a production-sized job would
    tune).
    """
    name = f"pofs_sink_{next(_COUNTER)}"
    ck = _ckpt_dir()
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        # restore only after termination: micro-batches are planned (and
        # read the session conf) asynchronously after start()
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)
