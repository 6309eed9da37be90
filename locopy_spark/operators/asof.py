"""As-of join — Spark-first implementation.

Spark has no native as-of join. Instead of a range join (O(n·m) within
key, quadratic blowup on hot keys) we use the union+window merge: tag
both sides, union, sort within key by (time, tag), and carry the right
side's values forward with ``last(..., ignorenulls)``. Cost: ONE
shuffle on the key — the same shuffle an equi-join would pay — and a
linear in-partition sort-merge, which survives 100 TB fact tables.
``direction='forward'`` runs the same merge over the reversed order;
``'nearest'`` computes both carries over the SAME partitioning (one
shuffle, two in-partition sorts) and picks the closer match per row.
``tolerance`` bounds the match distance (pandas ``merge_asof`` parity):
out-of-range matches null out, they are never silently kept.

Reference parity: the reference is a load/unload client with no join
engine; this operator belongs to the "beyond the reference" pipeline
surface (SURVEY.md §2.2 q_orders_asof_events / q_asof_nearest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_MATCH_T = "_match_t"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the as-of matching right row within
    the same ``on`` key (inclusive comparisons).

    ``direction``: ``'backward'`` (default) picks the most recent right
    row with ``right.time <= left.time``; ``'forward'`` the earliest
    with ``right.time >= left.time``; ``'nearest'`` the closer of the
    two (ties → backward). ``tolerance`` (same units as the time
    columns) nulls out matches farther than the bound. ``value_cols``
    are the right-side columns to carry. ``tiebreak`` (a right-side
    column) makes the pick deterministic when several right rows share
    a timestamp — the greatest wins.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"invalid direction: {direction!r}")
    passthrough = [c for c in left.columns if c not in (on, left_time)]
    # a tiebreak outside value_cols still needs to ride the union so
    # the window can order by it; it is dropped before returning
    extra_tb = (
        [tiebreak] if tiebreak and tiebreak not in value_cols else []
    )
    right_cols = value_cols + extra_tb
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_tag"),
        *[F.col(c) for c in passthrough],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_cols],
        F.lit(None).cast("long").alias(_MATCH_T),
    )
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_tag"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in passthrough],
        *[F.col(c) for c in right_cols],
        F.col(right_time).cast("long").alias(_MATCH_T),
    )
    carried = lt.unionByName(rt)
    tb = [F.col(tiebreak)] if tiebreak else []
    # same partitioning for every window → ONE shuffle; 'nearest' adds
    # a second in-partition sort, never a second exchange
    frame = (W.unboundedPreceding, 0)
    w_back = (
        W.partitionBy("_k").orderBy(F.col("_t"), F.col("_tag"), *tb).rowsBetween(*frame)
    )
    # forward: reversed time; right rows (_tag 0) still sort before the
    # left rows they may match at equal _t, keeping >= inclusive; the
    # tiebreak stays ascending, so among equal-time right rows the
    # GREATEST still wins (last() sees it last within the group)
    w_fwd = (
        W.partitionBy("_k")
        .orderBy(F.col("_t").desc(), F.col("_tag"), *tb)
        .rowsBetween(*frame)
    )
    carry_cols = value_cols + [_MATCH_T]
    directions = {"backward": [w_back], "forward": [w_fwd]}.get(
        direction, [w_back, w_fwd]
    )
    suffixes = (
        ["_b", "_f"] if direction == "nearest" else [""]
    )
    for w, sfx in zip(directions, suffixes):
        for c in carry_cols:
            carried = carried.withColumn(
                c + sfx, F.last(F.col(c), ignorenulls=True).over(w)
            )
    out = carried.filter(F.col("_tag") == 1)
    if direction == "nearest":
        # closer match wins; ties and one-sided matches fall backward
        d_b = F.abs(F.col("_t").cast("long") - F.col(_MATCH_T + "_b"))
        d_f = F.abs(F.col(_MATCH_T + "_f") - F.col("_t").cast("long"))
        use_b = F.col(_MATCH_T + "_f").isNull() | (
            F.col(_MATCH_T + "_b").isNotNull() & (d_b <= d_f)
        )
        for c in carry_cols:
            out = out.withColumn(
                c, F.when(use_b, F.col(c + "_b")).otherwise(F.col(c + "_f"))
            )
        out = out.drop(*[c + s for c in carry_cols for s in ("_b", "_f")])
    if tolerance is not None:
        dist = F.abs(F.col("_t").cast("long") - F.col(_MATCH_T))
        in_range = F.col(_MATCH_T).isNotNull() & (dist <= F.lit(tolerance))
        for c in value_cols:
            out = out.withColumn(c, F.when(in_range, F.col(c)))
        out = out.withColumn(
            _MATCH_T, F.when(in_range, F.col(_MATCH_T))
        )
    return (
        out.drop("_tag", *extra_tb)
        .withColumnRenamed(_MATCH_T, "asof_match_t")
        .withColumnRenamed("_k", on)
        .withColumnRenamed("_t", left_time)
    )
