"""As-of join — Spark-first implementation.

Spark has no native as-of join. Instead of a range join (O(n·m) within
key, quadratic blowup on hot keys) we use the union+window merge: tag
both sides, union, sort within key by (time, tag), and carry the right
side's values forward with ``last(..., ignorenulls)``. Cost: ONE
shuffle on the key — the same shuffle an equi-join would pay — and a
linear in-partition sort-merge, which survives 100 TB fact tables.

Reference parity: the reference is a load/unload client with no join
engine; this operator belongs to the "beyond the reference" pipeline
surface (SURVEY.md §2.2 q_orders_asof_events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.time <= left.time`` within the same ``on`` key (inclusive).

    ``value_cols`` are the right-side columns to carry. ``tiebreak``
    (a right-side column) makes the pick deterministic when several
    right rows share a timestamp — the greatest wins.
    """
    passthrough = [c for c in left.columns if c not in (on, left_time)]
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in passthrough],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in value_cols],
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in passthrough],
        *[F.col(c) for c in value_cols],
    )
    order = [F.col("_t"), F.col("_tag")] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    w = W.partitionBy("_k").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    carried = lt.unionByName(rt)
    for c in value_cols:
        carried = carried.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_tag") == 1)
        .drop("_tag")
        .withColumnRenamed("_k", on)
        .withColumnRenamed("_t", left_time)
    )
