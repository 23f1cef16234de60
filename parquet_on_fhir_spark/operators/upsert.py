"""CDC folding: MERGE-style upsert and SCD2 historization — the
emulation patterns for environments without a transactional table format
(plain Spark SQL has no MERGE INTO target without a transactional format
such as Delta/Iceberg; the standard emulation is anti-join + union +
window, as used here).

At 100 TB the upsert is one shuffle on the key (outer join); SCD2 is the
same plus a per-key window sort. With Delta/Iceberg on the classpath the
same call sites would delegate to MERGE INTO.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Apply ``updates`` onto ``target`` by key: matching rows are
    replaced by the update row, unmatched update rows are inserted,
    untouched target rows pass through. Column sets must match."""
    keys = list(keys)
    assert set(target.columns) == set(updates.columns), "column sets must match"
    untouched = target.join(updates.select(*keys), keys, "left_anti")
    return untouched.unionByName(updates)


def fold_cdc_latest(
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Fold a CDC change stream to the latest state per key: keep the row
    with the highest ``seq_col`` (ties: all-column struct order), then
    drop rows flagged deleted. One shuffle on the key.

    Replay-deterministic: equal ``seq_col`` values are broken by the
    descending struct order of the remaining columns, so folding the same
    change set always yields the same final state regardless of input
    partitioning (row_number alone over a tied orderBy is not stable)."""
    keys = list(keys)
    tiebreak = [c for c in changes.columns if c not in keys and c != seq_col]
    order = [F.desc(seq_col)]
    if tiebreak:
        order.append(F.desc(F.struct(*tiebreak)))
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_col is not None:
        latest = latest.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return latest


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    effective_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type 2: ``current`` rows carry
    [valid_from, valid_to) ranges (open rows have null valid_to);
    ``updates`` rows carry their effective timestamp in
    ``effective_col``. Each update closes the key's open row at its
    effective time and opens a new version.

    Implementation: union current versions with updates-as-new-versions,
    then recompute validity ranges per key with lead() — idempotent over
    replays of the same updates.
    """
    keys = list(keys)
    attr_cols = [
        c
        for c in current.columns
        if c not in keys and c not in (valid_from, valid_to)
    ]
    new_versions = updates.select(
        *keys, *attr_cols, F.col(effective_col).alias(valid_from)
    )
    all_versions = (
        current.select(*keys, *attr_cols, valid_from)
        .unionByName(new_versions)
        .dropDuplicates(keys + [valid_from])
    )
    w = Window.partitionBy(*keys).orderBy(valid_from)
    return all_versions.withColumn(valid_to, F.lead(valid_from).over(w))
