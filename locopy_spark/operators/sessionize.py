"""Gap-based sessionization (batch).

The classic islands trick: within each user, a session boundary is a
gap larger than the threshold; the running sum of boundary flags is
the session id. One shuffle on the user key, linear within partition.
The streaming twin lives in ``locopy_spark.streaming.jobs`` using
``session_window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from locopy_spark.functions.numeric import epoch_us, exact_sum


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign session ids per user; timestamps compared in exact µs."""
    gap_us = gap_minutes * 60 * 1_000_000
    t = epoch_us(events, ts_col)
    w = W.partitionBy(user_col).orderBy(t, F.col(order_tiebreak))
    flagged = events.withColumn(
        "_new_session",
        F.when(
            (t - F.lag(t).over(w)) > F.lit(gap_us), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    ws = W.partitionBy(user_col).orderBy(t, F.col(order_tiebreak)).rowsBetween(
        W.unboundedPreceding, 0
    )
    return flagged.withColumn("session_id", F.sum("_new_session").over(ws)).drop(
        "_new_session"
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: bounds (epoch µs), event count, value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    t = epoch_us(events, ts_col)
    return (
        s.groupBy(user_col, "session_id")
        .agg(
            F.min(t).alias("session_start_us"),
            F.max(t).alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .withColumn(
            "duration_s",
            ((F.col("session_end_us") - F.col("session_start_us")) / F.lit(1_000_000.0)),
        )
    )
