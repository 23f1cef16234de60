"""Skew-mitigation join (SURVEY.md §4: hot keys → salting).

AQE's skew-join split handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled, on in session.py); explicit
salting remains necessary when a single key is so hot that even split
partitions overwhelm one executor, or when the skewed side feeds a
window/aggregate that AQE can't split. Result set is identical to the
plain join — only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on``.

    The skewed side gets a uniform random salt in [0, salt); the small
    side is replicated ``salt``× with every salt value. The join key
    becomes (on, salt), spreading each hot key over ``salt`` reducers.
    Cost: small side shuffles salt× more rows — size it so
    |small| × salt stays well under the skewed partition it's fixing.
    """
    salted_left = skewed.withColumn(
        "__salt", (F.rand(42) * salt).cast("int")
    )
    salted_right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_left.join(salted_right, [on, "__salt"], how).drop("__salt")


def skew_report(df, cols: list[str], k: int = 10):
    """Key-skew diagnostic for the columns a pipeline is about to
    shuffle on: top-``k`` heaviest key values per column with row counts
    and corpus share — the report that decides between a plain shuffle,
    AQE skew-join, and :func:`salted_join`.

    ONE pass over the table regardless of how many columns are probed:
    each row explodes to (column, value) pairs map-side, one hash
    aggregate counts them (shuffle rows = distinct keys across all
    probed columns, with map-side partial combine), and a per-column
    window ranks the already-aggregated counts. ``share`` is the
    fraction of all rows carrying that value — a top key with share
    ≫ 1/shuffle-partitions is the straggler predictor.

    Output: (column, key_value STRING, n_rows, share DOUBLE, rank).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("skew_report needs at least one column")
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(c).cast("string").alias("key_value"),
            )
            for c in cols
        ]
    )
    total = df.count()
    exploded = df.select(F.explode(pairs).alias("p")).select("p.*")
    counts = exploded.groupBy("column", "key_value").agg(
        F.count("*").alias("n_rows")
    )
    w = Window.partitionBy("column").orderBy(
        F.desc("n_rows"), F.asc_nulls_last("key_value")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("share", F.col("n_rows") / F.lit(float(total)))
        .select("column", "key_value", "n_rows", "share", "rank")
    )
