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
