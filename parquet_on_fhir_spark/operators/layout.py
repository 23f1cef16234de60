"""Write-time data layout for scan pruning at 100 TB.

Two levers Spark gives you without any table-format dependency:

1. **Range-clustered files** (``optimize_layout``): repartitionByRange +
   sortWithinPartitions on the clustering columns before writing. Each
   parquet file then covers a narrow, near-disjoint value range, so the
   row-group/file min-max statistics turn point/range predicates into
   file skips — the poor man's Z-order, and exactly what a 100 TB scan
   needs before any filter even reaches the row level.

2. **Runtime bloom-filter join pruning** (``enable_runtime_filters``):
   Spark's runtime filter optimization (spark.sql.optimizer.runtime.
   bloomFilter.*) builds a bloom filter from the selective (creation)
   side of a shuffle join and injects a ``might_contain`` predicate into
   the probe-side scan — rows that cannot match are dropped BEFORE the
   shuffle. On a fact-dim join where the dim is filtered hard, this
   removes most of the shuffle volume at the cost of one tiny aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def optimize_layout(
    df: DataFrame, sort_cols: list[str], n_files: int | None = None
) -> DataFrame:
    """Range-cluster ``df`` on ``sort_cols`` so a subsequent write yields
    files with near-disjoint min-max ranges on those columns. One range
    shuffle; the per-partition sort is spillable."""
    parts = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files is not None
        else df.repartitionByRange(*sort_cols)
    )
    return parts.sortWithinPartitions(*sort_cols)


def write_clustered(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    n_files: int | None = None,
    partition_by: list[str] | None = None,
) -> None:
    """Write a range-clustered parquet table (snappy, stats on)."""
    out = optimize_layout(df, sort_cols, n_files)
    writer = out.write.mode("overwrite").option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


_RUNTIME_FILTER_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local test data is far below the default 10GB application-side
    # threshold; production clusters should keep the defaults
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
}


def enable_runtime_filters(spark: SparkSession, for_local_test: bool = False) -> None:
    """Turn on runtime bloom-filter join pruning. With
    ``for_local_test`` the size thresholds are lowered so the
    optimization fires on the small local tables (production keeps
    Spark's defaults, which gate it to genuinely large scans)."""
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    if for_local_test:
        for k, v in _RUNTIME_FILTER_CONFS.items():
            spark.conf.set(k, v)


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    sort_cols: list[str] | None = None,
    min_files: int = 2,
) -> dict:
    """Rewrite a small-files table (the residue of streaming ingest /
    many incremental appends) into ~``target_file_mb`` files.

    Sizing comes from the table's own file listing via the Hadoop
    FileSystem API — works on file:/, hdfs:/ or s3a:/ alike and costs
    one metadata listing, no data read. The rewrite is ONE job:
    ``coalesce`` (no shuffle) when only merging, or a range shuffle when
    ``sort_cols`` asks for clustering while we're paying for the rewrite
    anyway. Writes to ``<path>__compact`` then swaps, so a concurrent
    reader sees either the old or the new file set, never a mix.

    Returns ``{files_before, files_after, bytes, skipped}``.
    """
    import math

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    it = fs.listFiles(hpath, True)
    n_files, total = 0, 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        n_files += 1
        total += f.getLen()
    n_target = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    if n_files < min_files or n_files <= n_target:
        return {"files_before": n_files, "files_after": n_files,
                "bytes": total, "skipped": True}

    df = spark.read.parquet(path)
    if sort_cols:
        out = optimize_layout(df, sort_cols, n_target)
    else:
        out = df.coalesce(n_target)
    tmp = f"{path}__compact"
    out.write.mode("overwrite").option("compression", "snappy").parquet(tmp)
    bak = f"{path}__old"
    fs.delete(jvm.org.apache.hadoop.fs.Path(bak), True)
    if not fs.rename(hpath, jvm.org.apache.hadoop.fs.Path(bak)):
        raise IOError(f"compact_table: cannot move {path} aside")
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath):
        # roll back
        fs.rename(jvm.org.apache.hadoop.fs.Path(bak), hpath)
        raise IOError(f"compact_table: cannot move {tmp} into place")
    fs.delete(jvm.org.apache.hadoop.fs.Path(bak), True)
    return {"files_before": n_files, "files_after": n_target,
            "bytes": total, "skipped": False}


def zorder_key(x, y, bits: int = 21):
    """Morton/Z-order interleave of two non-negative integer columns into
    one BIGINT sort key (bit i of x → bit 2i, bit i of y → bit 2i+1).

    Range clustering on ONE column only prunes predicates on that column;
    sorting by the Z-key gives BOTH columns locality, so min-max file
    stats skip on either predicate — the multi-dimensional layout trick
    Delta/Iceberg OPTIMIZE ZORDER applies, as a pure Catalyst expression
    (an ``aggregate`` fold over the bit positions; 2·bits ≤ 63 keeps the
    result in the positive BIGINT range).  Normalize/rank inputs to
    ``[0, 2^bits)`` first for skewed domains.
    """
    from pyspark.sql import functions as F

    if 2 * bits > 63:
        raise ValueError("2*bits must fit in a signed 64-bit key")
    xs = (F.col(x) if isinstance(x, str) else x).cast("long")
    ys = (F.col(y) if isinstance(y, str) else y).cast("long")
    # bit positions are compile-time constants (shiftleft requires a
    # literal count), so the key is a flat OR chain — pure int ops,
    # whole-stage codegen keeps it branch-free
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(xs, i).bitwiseAND(1), i * 2)
        ).bitwiseOR(F.shiftleft(F.shiftright(ys, i).bitwiseAND(1), i * 2 + 1))
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 21,
    n_files: int | None = None,
) -> None:
    """Write ``df`` range-clustered by the Z-order key of (x, y): files
    get near-disjoint Morton ranges, i.e. rectangular tiles in (x, y)
    space, so min-max stats prune scans filtered on EITHER column.

    Both columns are first normalized to bucket ids over [0, 2^bits)
    (``width_bucket`` against global min/max, attached as a broadcast
    1-row crossJoin — no driver action): raw interleaving would let the
    wider-domain column dominate the high bits and the narrow column
    would barely tile.  Equal-width buckets match roughly-uniform keys;
    for heavy skew substitute rank buckets from approxQuantile
    boundaries (what Delta's OPTIMIZE ZORDER does)."""
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(x).alias("__xlo"),
        (F.max(x) + 1).alias("__xhi"),
        F.min(y).alias("__ylo"),
        (F.max(y) + 1).alias("__yhi"),
    )
    n = 1 << bits
    keyed = df.crossJoin(F.broadcast(stats)).withColumn(
        "__z",
        zorder_key(
            F.width_bucket(F.col(x), F.col("__xlo"), F.col("__xhi"), n) - 1,
            F.width_bucket(F.col(y), F.col("__ylo"), F.col("__yhi"), n) - 1,
            bits,
        ),
    )
    out = optimize_layout(keyed, ["__z"], n_files)
    out.drop("__z", "__xlo", "__xhi", "__ylo", "__yhi").write.mode(
        "overwrite"
    ).parquet(path)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_cols: list[str],
    compare_cols: list[str] | None = None,
):
    """Row-level diff between two table snapshots — the audit that
    precedes any incremental publish: which ids were ADDED, REMOVED,
    or CHANGED (content hash of the compared columns differs), and
    which are UNCHANGED.

    One full outer join keyed by id; content comparison is a sha2 over
    the null-tagged concatenation of the compared columns (computed
    map-side on each snapshot — wide rows never shuffle twice, only
    (id, hash) pairs meet at the join). Output: (*id_cols, change
    STRING in added/removed/changed/unchanged).
    """
    from pyspark.sql import functions as F

    compare_cols = compare_cols or [
        c for c in new.columns if c in set(old.columns) and c not in set(id_cols)
    ]
    if not compare_cols:
        raise ValueError("snapshot_diff needs at least one compared column")

    def hashed(df):
        payload = F.concat_ws(
            "\x01",
            *[
                F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                for c in compare_cols
            ],
        )
        return df.select(*id_cols, F.sha2(payload, 256).alias("__h"))

    o = hashed(old).withColumnRenamed("__h", "__ho")
    n = hashed(new).withColumnRenamed("__h", "__hn")
    joined = o.join(n, id_cols, "full_outer")
    change = (
        F.when(F.col("__ho").isNull(), "added")
        .when(F.col("__hn").isNull(), "removed")
        .when(F.col("__ho") != F.col("__hn"), "changed")
        .otherwise("unchanged")
    )
    return joined.select(*id_cols, change.alias("change"))
