"""Event-stream analytics (batch twins of the streaming jobs).

All timestamps are compared in exact epoch microseconds (bigint) —
Spark's µs-truncated read of the nanosecond parquet matches DuckDB's
native ns→µs truncation, so arithmetic on ``unix_micros``/``epoch_us``
is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locopy_spark.functions.numeric import (
    epoch_us,
    exact_sum,
    sql_epoch_us,
    sql_exact_sum,
)
from locopy_spark.operators.asof import asof_join
from locopy_spark.operators.sessionize import session_stats
from locopy_spark.sources.tables import load_table

GAP_MINUTES = 30


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type.

    Batch twin of ``streaming.jobs.stream_window_agg`` — one shuffle on
    (hour, type); partial aggregation map-side.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            # floor-to-hour in pure integer epoch math: identical in any
            # session time zone (date_trunc on an LTZ column is not)
            F.expr(f"({sql_epoch_us(e, 'ts')}) div 3600000000 * 3600").alias(
                "hour_ts"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            exact_sum("value", "sum_value"),
        )
        .orderBy("hour_ts", "event_type")
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) per user — islands via lag+cumsum."""
    e = load_table(spark, sf_dir, "events")
    return session_stats(e, gap_minutes=GAP_MINUTES).orderBy("user_id", "session_id")


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the numeric ``k`` property from the JSON props column.

    Regex extraction stays JVM-side (codegen) — the portable subset of
    JSON-path both engines evaluate identically.
    """
    e = load_table(spark, sf_dir, "events")
    # try_cast, not cast: a props blob without "k" extracts '' and a
    # plain ANSI cast would CRASH on it — malformed/missing JSON is a
    # routine mid-stream reality (the oracle already uses TRY_CAST)
    k = F.expr(
        "try_cast(regexp_extract(props, '\"k\":\\\\s*(\\\\d+)', 1) as bigint)"
    )
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        )
        .orderBy("event_type")
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel per user (conditional mins)."""
    e = load_table(spark, sf_dir, "events")
    t = epoch_us(e, "ts")
    agg = (
        e.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", t)).alias("first_view_us"),
            F.min(F.when(F.col("event_type") == "click", t)).alias("first_click_us"),
            F.min(F.when(F.col("event_type") == "purchase", t)).alias(
                "first_purchase_us"
            ),
        )
    )
    return (
        agg.filter(
            (F.col("first_view_us") < F.col("first_click_us"))
            & (F.col("first_click_us") < F.col("first_purchase_us"))
        )
        .orderBy("user_id")
    )


def q_orders_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event ↔ the customer's latest order at
    or before the event time (union+window merge, one shuffle)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    o = load_table(spark, sf_dir, "orders")
    left = e.select("user_id", "event_id", epoch_us(e, "ts").alias("ts_us"))
    right = o.select(
        F.col("o_custkey").alias("user_id"),
        epoch_us(o, "o_orderdate").alias("od_us"),
        "o_orderkey",
        "o_totalprice",
    )
    return (
        asof_join(
            left,
            right,
            on="user_id",
            left_time="ts_us",
            right_time="od_us",
            value_cols=["o_orderkey", "o_totalprice"],
            tiebreak="o_orderkey",
        )
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_totalprice").alias("last_totalprice"),
        )
        .orderBy("event_id")
    )


ASOF_TOL_US = 30 * 60 * 1_000_000  # 30-minute nearest-match bound


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join with tolerance: each click event
    matched to the same user's view event CLOSEST in time (before or
    after), within 30 minutes — pandas ``merge_asof(direction=
    'nearest', tolerance=...)`` semantics at Spark scale. Same
    union+window merge as the backward join (ONE shuffle, both
    direction carries over the same partitioning); out-of-tolerance
    matches null out. Ties at equal distance fall backward; equal-time
    views resolve to the greatest event id.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    left = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", ts_us.alias("ts_us")
    )
    right = e.filter(F.col("event_type") == "view").select(
        "user_id",
        ts_us.alias("v_us"),
        F.col("event_id").alias("view_id"),
    )
    return (
        asof_join(
            left,
            right,
            on="user_id",
            left_time="ts_us",
            right_time="v_us",
            value_cols=["view_id"],
            tiebreak="view_id",
            direction="nearest",
            tolerance=ASOF_TOL_US,
        )
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.col("asof_match_t").alias("near_view_us"),
            F.col("view_id").alias("near_view_id"),
        )
        .orderBy("event_id")
    )


_SESSION_GAP_US = GAP_MINUTES * 60 * 1_000_000

ORACLE: dict[str, str] = {
    "q_events_window": f"""
        SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_ts,
               event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               {sql_exact_sum("value", "sum_value")}
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q_events_sessionize": f"""
        WITH e AS (
          SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events
        ), f AS (
          SELECT *, CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                              > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS ns
          FROM e
        ), s AS (
          SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS session_id
          FROM f
        )
        SELECT user_id, session_id,
               MIN(t) AS session_start_us,
               MAX(t) AS session_end_us,
               COUNT(*) AS n_events,
               {sql_exact_sum("value", "sum_value")},
               (MAX(t) - MIN(t)) / 1000000.0 AS duration_s
        FROM s
        GROUP BY user_id, session_id
        ORDER BY user_id, session_id
    """,
    "q_events_json_props": r"""
        WITH e AS (
          SELECT event_type,
                 TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
          FROM events
        )
        SELECT event_type,
               COUNT(k) AS n_with_k,
               CAST(SUM(k) AS BIGINT) AS sum_k,
               CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
        FROM e
        GROUP BY event_type
        ORDER BY event_type
    """,
    "q_events_funnel": """
        SELECT user_id, first_view_us, first_click_us, first_purchase_us
        FROM (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us,
                 MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_click_us,
                 MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
          FROM events GROUP BY user_id
        )
        WHERE first_view_us < first_click_us
          AND first_click_us < first_purchase_us
        ORDER BY user_id
    """,
    "q_orders_asof_events": """
        WITH u AS (
          SELECT user_id AS k, epoch_us(ts) AS t, 1 AS tag, event_id,
                 NULL::BIGINT AS o_orderkey, NULL::DOUBLE AS o_totalprice
          FROM events WHERE event_type = 'purchase'
          UNION ALL
          SELECT o_custkey, epoch_us(o_orderdate), 0, NULL, o_orderkey, o_totalprice
          FROM orders
        ), w AS (
          SELECT *,
            last_value(o_orderkey IGNORE NULLS) OVER
              (PARTITION BY k ORDER BY t, tag, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_orderkey,
            last_value(o_totalprice IGNORE NULLS) OVER
              (PARTITION BY k ORDER BY t, tag, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_totalprice
          FROM u
        )
        SELECT event_id, k AS user_id, t AS ts_us, last_orderkey, last_totalprice
        FROM w WHERE tag = 1
        ORDER BY event_id
    """,
    # spelled-out nearest pick (DuckDB's native ASOF JOIN leaves ties
    # unspecified, so the oracle states the rule: closer side wins,
    # equal distance falls backward, greatest orderkey on equal dates)
    "q_asof_nearest": f"""
        WITH p AS (
          SELECT user_id, event_id, epoch_us(ts) AS ts_us
          FROM events WHERE event_type = 'click'
        ), v AS (
          SELECT user_id, epoch_us(ts) AS v_us, event_id AS view_id
          FROM events WHERE event_type = 'view'
        ), b AS (
          SELECT p.event_id, p.user_id, p.ts_us,
                 (SELECT MAX(v_us) FROM v
                  WHERE v.user_id = p.user_id AND v_us <= p.ts_us) AS b_t,
                 (SELECT MIN(v_us) FROM v
                  WHERE v.user_id = p.user_id AND v_us >= p.ts_us) AS f_t
          FROM p
        ), pick AS (
          SELECT event_id, user_id, ts_us, CASE
            WHEN b_t IS NULL AND f_t IS NULL THEN NULL
            WHEN f_t IS NULL THEN b_t
            WHEN b_t IS NULL THEN f_t
            WHEN (ts_us - b_t) <= (f_t - ts_us) THEN b_t
            ELSE f_t END AS m_t
          FROM b
        ), tol AS (
          SELECT event_id, user_id, ts_us,
                 CASE WHEN m_t IS NOT NULL
                      AND ABS(ts_us - m_t) <= {ASOF_TOL_US}
                      THEN m_t END AS near_view_us
          FROM pick
        )
        SELECT t.event_id, t.user_id, t.ts_us, t.near_view_us,
               (SELECT MAX(view_id) FROM v
                WHERE v.user_id = t.user_id
                  AND v.v_us = t.near_view_us) AS near_view_id
        FROM tol t ORDER BY event_id
    """,
}
