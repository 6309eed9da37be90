"""Interval (range) join: points joined to containing intervals.

The naive plan for ``point BETWEEN lo AND hi`` is a broadcast nested
loop (or worse, a cartesian) — O(|points| × |intervals|). The scale
path here buckets time: every interval explodes to the buckets it
covers, points map to their bucket, and the join becomes an equi-join
on (key, bucket) followed by the exact containment filter. Work is
O(|points| + |intervals| × avg_buckets_per_interval), one shuffle,
AQE-skew-safe. Pick ``bucket`` ≈ the median interval length so most
intervals explode to ≤ 2 buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: int,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point < hi`` (and equal ``keys`` when given).

    ``point_col``/``lo_col``/``hi_col`` are BIGINT columns (epoch
    micros or any monotonic integer); ``bucket`` is the bucket width in
    the same unit.
    """
    keys = keys or []
    p = points.withColumn("__b", (F.col(point_col) / bucket).cast("bigint"))
    iv = (
        intervals.withColumn(
            "__bs",
            F.expr(
                f"sequence(cast({lo_col} / {bucket} as bigint), "
                f"cast(({hi_col} - 1) / {bucket} as bigint))"
            ),
        )
        .withColumn("__rb", F.explode("__bs"))
        .drop("__bs")
    )
    # disambiguate the interval side's join keys
    for k in keys:
        iv = iv.withColumnRenamed(k, f"__r_{k}")
    cond: Column = F.col("__b") == F.col("__rb")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    joined = p.join(iv, cond, how)
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    ).drop("__b", "__rb", *[f"__r_{k}" for k in keys])


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side's hot keys across
    ``n_salts`` partitions, replicate the small side per salt.

    AQE's skew-join split handles most cases at runtime; explicit
    salting is for the pathological key whose single value exceeds an
    executor (every row of one user, one null-bucket, …). Result is
    identical to ``big.join(small, key, how)``.
    """
    b = big.withColumn(
        "__salt", (F.spark_partition_id() % n_salts).cast("int")
    )
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")
