"""Event analytics, batch 2: cohort retention and exact distributed
percentiles.

Week bucketing is pure integer epoch math (µs div day div 7) so every
engine and every session time zone agrees; percentiles use the
discrete (type-1) definition over exact scaled bigints — rank
selection, no float interpolation — which is bit-identical at any
parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from locopy_spark.functions.numeric import SCALE, epoch_us, sql_epoch_us
from locopy_spark.sources.tables import load_table

US_PER_DAY = 86_400_000_000
PCTS = (0.50, 0.90, 0.99)


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-active week,
    counted per week offset.

    Two shuffles total: one groupBy(user) building the per-user week
    SET (collect_set — the cohort week is its min, so no self-join),
    then the final (cohort, offset) groupBy. Each user contributes a
    given (cohort, offset) at most once by construction, so a plain
    COUNT replaces the two-phase COUNT DISTINCT.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.select(
            "user_id",
            F.expr(f"({sql_epoch_us(e, 'ts')}) div {US_PER_DAY} div 7").alias(
                "wk"
            ),
        )
        .groupBy("user_id")
        .agg(F.collect_set("wk").alias("wks"))
    )
    return (
        per_user.select(
            F.array_min("wks").alias("cohort_wk"), F.explode("wks").alias("wk")
        )
        .groupBy(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("wk_offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_wk", "wk_offset")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles of order value per priority.

    Rank-selection percentile (value at ceil(p·n)) over exact scaled
    bigints: one sort-within-partition window + one groupBy. At 100 TB
    the same shape works because the partition key (priority) bounds
    each sort; for percentile-over-everything use approx_percentile.
    """
    o = load_table(spark, sf_dir, "orders")
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    base = o.select("o_orderpriority", v.alias("v"))
    wr = W.partitionBy("o_orderpriority").orderBy("v")
    wn = W.partitionBy("o_orderpriority")
    ranked = base.withColumn("rn", F.row_number().over(wr)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    aggs = [
        (
            F.max(
                F.expr(
                    f"case when rn = cast(ceil({p} * n) as bigint) then v end"
                )
            ).cast("double")
            / F.lit(float(SCALE))
        ).alias(f"p{int(p * 100)}")
        for p in PCTS
    ]
    return (
        ranked.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), *aggs)
        .orderBy("o_orderpriority")
    )


ATTR_WINDOW_US = 30 * 60 * 1_000_000  # 30-minute attribution window


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution range join: views/clicks of the same user inside
    the 30 minutes before each purchase — interval containment via the
    bucketed range join (equi-join on (user, bucket), never a nested
    loop)."""
    from locopy_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    points = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_type").alias("p_type"),
        ts_us.alias("p_us"),
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (ts_us - F.lit(ATTR_WINDOW_US)).alias("lo_us"),
        ts_us.alias("hi_us"),
    )
    return (
        range_join(
            points,
            intervals,
            point_col="p_us",
            lo_col="lo_us",
            hi_col="hi_us",
            bucket=ATTR_WINDOW_US,
            keys=["user_id"],
        )
        .groupBy("purchase_id")
        .agg(
            F.sum(F.expr("cast(p_type = 'view' as int)")).alias("n_views"),
            F.sum(F.expr("cast(p_type = 'click' as int)")).alias("n_clicks"),
        )
        .orderBy("purchase_id")
    )


def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag window);
    first order ⇒ -1."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    od = epoch_us(o, "o_orderdate")
    w = Window.partitionBy("o_custkey").orderBy("od_us", "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", od.alias("od_us"))
        .withColumn(
            "gap_days",
            F.coalesce(
                (F.col("od_us") - F.lag("od_us").over(w)) / F.lit(US_PER_DAY),
                F.lit(-1.0),
            ),
        )
        .select("o_custkey", "o_orderkey", "gap_days")
        .orderBy("o_custkey", "o_orderkey")
    )


def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (Greenwald-Khanna via
    approx_percentile) — the single-pass mergeable path for
    percentile-over-everything at 100 TB, where the rank-select window
    of ``q_percentiles`` would need a global sort.  Oracle-hardened:
    raw sketch values are engine-specific, so the output carries the
    exact group counts plus booleans asserting each GK estimate landed
    within 5% of the exact interpolated percentile (computed Spark-side
    purely for verification; the production path is the sketch alone —
    ``percentile`` holds per-group value maps, fine at verify SF,
    not the 100 TB plan)."""
    o = load_table(spark, sf_dir, "orders")
    pcts = list(PCTS)
    acc = 10_000
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        *[
            F.expr(f"approx_percentile(o_totalprice, {p}, {acc})").alias(
                f"__a{int(p * 100)}"
            )
            for p in pcts
        ],
        *[
            F.expr(f"percentile(o_totalprice, {p})").alias(f"__e{int(p * 100)}")
            for p in pcts
        ],
    )
    ok = [
        (
            F.abs(F.col(f"__a{int(p * 100)}") - F.col(f"__e{int(p * 100)}"))
            * F.lit(100)
            <= F.lit(5) * F.abs(F.col(f"__e{int(p * 100)}"))
        ).alias(f"p{int(p * 100)}_ok")
        for p in pcts
    ]
    return agg.select("o_orderpriority", "n_orders", *ok).orderBy(
        "o_orderpriority"
    )


def q_events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing (from_json with an explicit schema — the
    production path for semi-structured columns; the regex variant in
    ``events.q_events_json_props`` is the fallback for ragged data).
    Integer sums are exact, so the aggregate is oracle-stable."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", "k LONG").getField("k")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.expr("CAST(SUM(k) AS DOUBLE) / COUNT(k)").alias("mean_k"),
        )
        .orderBy("event_type")
    )


CUTOVER_DAY = 19_740  # epoch day splitting "history" from "delta"


def q_incr_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance: hourly per-type aggregates built
    as state (events before the cutover) + delta (after), merged
    additively. The ORACLE is the one-shot full aggregate — the check
    proves incremental == batch, the property that lets a 100 TB
    rollup refresh by touching only new partitions."""
    from locopy_spark.operators.merge import merge_additive

    e = load_table(spark, sf_dir, "events")
    ts_us_sql = sql_epoch_us(e, "ts")
    day = F.expr(f"({ts_us_sql}) div {US_PER_DAY}")

    def rollup(df):
        return df.groupBy(
            F.expr(f"({ts_us_sql}) div 3600000000 * 3600").alias("hour_ts"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.expr("cast(floor(value * 1000 + 0.5) as bigint)")
            ).alias("sum_value_fix"),
        )

    state = rollup(e.filter(day < CUTOVER_DAY))
    delta = rollup(e.filter(day >= CUTOVER_DAY))
    return (
        merge_additive(
            state,
            delta,
            keys=["hour_ts", "event_type"],
            add_cols=["n_events", "sum_value_fix"],
        )
        .withColumn(
            "sum_value", F.expr("CAST(sum_value_fix AS DOUBLE) / 1000.0")
        )
        .drop("sum_value_fix")
        .orderBy("hour_ts", "event_type")
    )


def _oracle_percentiles() -> str:
    sel = ", ".join(
        f"CAST(MAX(CASE WHEN rn = CAST(ceil({p} * n) AS BIGINT) THEN v END)"
        f" AS DOUBLE) / {SCALE}.0 AS p{int(p * 100)}"
        for p in PCTS
    )
    return f"""
      WITH r AS (
        SELECT o_orderpriority,
               CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v,
               ROW_NUMBER() OVER (
                 PARTITION BY o_orderpriority
                 ORDER BY CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)
               ) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
      )
      SELECT o_orderpriority, COUNT(*) AS n_orders, {sel}
      FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
    """


ORACLE: dict[str, str] = {
    "q_retention_cohorts": f"""
      WITH uw AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // {US_PER_DAY} // 7 AS wk
        FROM events
      ),
      cohort AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM uw GROUP BY user_id
      )
      SELECT cohort_wk, wk - cohort_wk AS wk_offset,
             COUNT(DISTINCT uw.user_id) AS n_users
      FROM uw JOIN cohort ON uw.user_id = cohort.user_id
      GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_percentiles": _oracle_percentiles(),
    # Sketch query: counts are cross-engine; *_ok booleans are TRUE iff
    # Spark's GK sketch is within 5% of the exact percentile (asserted
    # Spark-side; a drifting sketch flips a boolean and hash-mismatches).
    "q_approx_percentiles": """
      SELECT o_orderpriority, COUNT(*) AS n_orders,
             TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q_range_join": f"""
      SELECT p.event_id AS purchase_id,
             CAST(SUM(CASE WHEN x.event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_views,
             CAST(SUM(CASE WHEN x.event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks
      FROM events p JOIN events x
        ON p.event_type = 'purchase'
       AND x.event_type IN ('view', 'click')
       AND x.user_id = p.user_id
       AND epoch_us(x.ts) >= epoch_us(p.ts) - {ATTR_WINDOW_US}
       AND epoch_us(x.ts) < epoch_us(p.ts)
      GROUP BY 1 ORDER BY 1
    """,
    "q_incr_rollup": """
      SELECT epoch_us(date_trunc('hour', ts)) // 1000000 AS hour_ts,
             event_type, COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000.0 AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_events_json_typed": """
      SELECT event_type, COUNT(*) AS n_events,
             -- CAST: DuckDB SUM(BIGINT) returns HUGEINT, which the
             -- driver hasher types differently from Spark's BIGINT
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
               / COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS mean_k
      FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q_order_gaps": f"""
      SELECT o_custkey, o_orderkey,
             COALESCE((epoch_us(o_orderdate) - LAG(epoch_us(o_orderdate)) OVER (
               PARTITION BY o_custkey
               ORDER BY epoch_us(o_orderdate), o_orderkey
             )) / {US_PER_DAY}.0, -1.0) AS gap_days
      FROM orders
      ORDER BY o_custkey, o_orderkey
    """,
}


OVERLAP_BUCKET_US = 3_600_000_000  # 1-hour interval-join buckets
# bucket ~ interval scale: sessions last minutes-to-hours, so hour
# buckets keep per-bucket candidate sets small while each interval
# still covers only a couple of buckets (day buckets were measured
# 20x more candidates at sf0.1)


def q_session_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of DIFFERENT users whose
    sessions overlap in time (co-presence analysis), aggregated per
    user pair with the exact total overlap duration.

    The interval×interval companion of ``q_range_join``'s
    point-in-interval shape: each session interval explodes to the
    day buckets it covers, candidates come from the bucket equi-join
    (never an inequality nested loop), the exact overlap predicate
    filters inside buckets, and cross-bucket double-counts collapse
    with one distinct. At 100 TB the bucket width is the knob: wide
    enough that intervals cover few buckets, narrow enough that a
    bucket's sessions fit a task — a globally hot bucket is AQE's
    skew-join case. All arithmetic is integer epoch micros, so the
    aggregate is oracle-exact.
    """
    from locopy_spark.operators.sessionize import session_stats

    e = load_table(spark, sf_dir, "events")
    sess = session_stats(e).select(
        "user_id",
        "session_id",
        F.col("session_start_us").alias("lo"),
        F.col("session_end_us").alias("hi"),
    )
    B = OVERLAP_BUCKET_US
    bucketed = sess.withColumn(
        "b", F.explode(F.expr(f"sequence(lo div {B}, hi div {B})"))
    )
    a = bucketed.select(
        F.col("user_id").alias("ua"), F.col("session_id").alias("sa"),
        F.col("lo").alias("lo_a"), F.col("hi").alias("hi_a"), "b",
    )
    bside = bucketed.select(
        F.col("user_id").alias("ub"), F.col("session_id").alias("sb"),
        F.col("lo").alias("lo_b"), F.col("hi").alias("hi_b"), "b",
    )
    pairs = (
        a.join(bside, "b")
        .filter(
            (F.col("ua") < F.col("ub"))
            & (F.col("lo_a") <= F.col("hi_b"))
            & (F.col("lo_b") <= F.col("hi_a"))
        )
        .select("ua", "sa", "ub", "sb", "lo_a", "hi_a", "lo_b", "hi_b")
        .distinct()
    )
    return (
        pairs.groupBy(
            F.col("ua").alias("user_a"), F.col("ub").alias("user_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_overlaps"),
            F.sum(
                F.least("hi_a", "hi_b") - F.greatest("lo_a", "lo_b")
            ).alias("overlap_us"),
        )
        .orderBy("user_a", "user_b")
    )


ORACLE["q_session_overlap"] = f"""
  WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS t FROM events
  ), f AS (
    SELECT *, CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                        > 1800000000 THEN 1 ELSE 0 END AS ns
    FROM e
  ), s AS (
    SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM f
  ), sess AS (
    SELECT user_id, sid, MIN(t) AS lo, MAX(t) AS hi FROM s GROUP BY 1, 2
  )
  SELECT a.user_id AS user_a, b.user_id AS user_b,
         COUNT(*) AS n_overlaps,
         CAST(SUM(LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo)) AS BIGINT)
           AS overlap_us
  FROM sess a JOIN sess b
    ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
  GROUP BY 1, 2 ORDER BY 1, 2
"""


TRAILING_DAYS = 30


def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE-frame window: for each order, the customer's
    exact spend and order count over the TRAILING 30 days (inclusive)
    — the frame every "rolling 30-day revenue" metric needs.  A ROWS
    frame (``q_moving_avg``) counts a fixed number of rows; a RANGE
    frame over integer epoch micros bounds by TIME, handles gaps, and
    includes ties at the boundary identically in every engine, so no
    tiebreak is needed for determinism.  One shuffle on the customer
    key; the frame scan is linear within partition.  Money sums use
    the floor-scaled bigint kernel, so the aggregate hash-matches.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        "o_orderkey",
        epoch_us(o, "o_orderdate").alias("od_us"),
        F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)").alias(
            "v_fix"
        ),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("od_us")
        .rangeBetween(-TRAILING_DAYS * US_PER_DAY, 0)
    )
    return (
        base.select(
            "o_custkey",
            "o_orderkey",
            "od_us",
            F.count(F.lit(1)).over(w).alias("n_trailing"),
            (
                F.sum("v_fix").over(w).cast("double") / F.lit(float(SCALE))
            ).alias("trailing_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORACLE["q_trailing_window"] = f"""
  WITH b AS (
    SELECT o_custkey, o_orderkey, epoch_us(o_orderdate) AS od_us,
           CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v_fix
    FROM orders
  )
  SELECT o_custkey, o_orderkey, od_us,
         COUNT(*) OVER w AS n_trailing,
         CAST(SUM(v_fix) OVER w AS DOUBLE) / {SCALE}.0 AS trailing_spend
  FROM b
  WINDOW w AS (PARTITION BY o_custkey ORDER BY od_us
               RANGE BETWEEN {TRAILING_DAYS * US_PER_DAY} PRECEDING
                 AND CURRENT ROW)
  ORDER BY o_custkey, o_orderkey
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix (Markov pair counts):
    for consecutive events of each user, count (from_type, to_type)
    pairs and each from-type's transition probability.

    One shuffle to the user key for the lag window (per-user sequences
    are short and bounded), then a transition-matrix-sized groupBy.
    The probability divides exact bigint counts in double — portable.
    Ordering inside a user is (ts, event_id): event_id breaks
    same-microsecond ties so the sequence is a total order.
    """
    return (
        transition_counts(spark, sf_dir)
        .select(
            "from_type",
            "to_type",
            "n_trans",
            (F.col("n_trans").cast("double") / F.col("n_from")).alias(
                "p_trans"
            ),
        )
        .orderBy("from_type", "to_type")
    )


ORACLE["q_event_transitions"] = """
  WITH s AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS next_type
    FROM events
  ),
  p AS (
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_trans
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
  ),
  t AS (
    SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
    FROM p GROUP BY from_type
  )
  SELECT p.from_type, p.to_type, p.n_trans,
         CAST(p.n_trans AS DOUBLE) / t.n_from AS p_trans
  FROM p JOIN t ON p.from_type = t.from_type
  ORDER BY p.from_type, p.to_type
"""


def q_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: for each purchase, the EARLIEST view or
    click of the same user in the preceding 30 minutes (the as-of
    family's dual — ``q_orders_asof_events`` carries the latest state
    backward; marketing attribution wants the first toucher).

    Same bucketed range join as ``q_range_join`` (equi-join on
    (user, bucket), never an inequality nested loop); the winner per
    purchase is one ``min_by`` over the unique (ts, id) candidate
    ordering — a partial-aggregated groupBy, no per-purchase sort.
    """
    from locopy_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    points = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        ts_us.alias("p_us"),
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        (ts_us - F.lit(ATTR_WINDOW_US)).alias("lo_us"),
        ts_us.alias("hi_us"),
    )
    cands = range_join(
        points,
        intervals,
        point_col="p_us",
        lo_col="lo_us",
        hi_col="hi_us",
        bucket=ATTR_WINDOW_US,
        keys=["user_id"],
    )
    return (
        cands.groupBy("purchase_id")
        .agg(
            F.expr("min_by(touch_id, struct(p_us, touch_id))").alias(
                "first_touch_id"
            ),
            F.expr("min_by(touch_type, struct(p_us, touch_id))").alias(
                "first_touch_type"
            ),
            F.count(F.lit(1)).alias("n_touches"),
        )
        .orderBy("purchase_id")
    )


ORACLE["q_first_touch"] = f"""
  WITH c AS (
    SELECT p.event_id AS purchase_id,
           x.event_id AS touch_id, x.event_type AS touch_type,
           epoch_us(x.ts) AS p_us,
           ROW_NUMBER() OVER (
             PARTITION BY p.event_id
             ORDER BY epoch_us(x.ts), x.event_id
           ) AS rn
    FROM events p JOIN events x
      ON p.event_type = 'purchase'
     AND x.event_type IN ('view', 'click')
     AND x.user_id = p.user_id
     AND epoch_us(x.ts) >= epoch_us(p.ts) - {ATTR_WINDOW_US}
     AND epoch_us(x.ts) < epoch_us(p.ts)
  )
  SELECT purchase_id,
         MAX(CASE WHEN rn = 1 THEN touch_id END) AS first_touch_id,
         MAX(CASE WHEN rn = 1 THEN touch_type END) AS first_touch_type,
         COUNT(*) AS n_touches
  FROM c GROUP BY purchase_id ORDER BY purchase_id
"""


def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop aggregation through Spark 4's VARIANT type:
    ``parse_json`` once into the binary variant encoding, then typed
    ``variant_get`` extraction — the scale path for semi-structured
    columns (parse once, extract many, no per-access string re-parse;
    shredded storage on modern table formats). Distribution stats of
    ``k`` per event type, exact integer math only.
    """
    e = load_table(spark, sf_dir, "events")
    k = "variant_get(parse_json(props), '$.k', 'long')"
    return (
        e.select("event_type", F.expr(k).alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
            F.expr("CAST(SUM(k % 10) AS BIGINT)").alias("sum_last_digit"),
        )
        .orderBy("event_type")
    )


ORACLE["q_events_variant"] = """
  WITH b AS (
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
  )
  SELECT event_type,
         COUNT(k) AS n_with_k,
         MIN(k) AS min_k, MAX(k) AS max_k,
         CAST(SUM(k) AS BIGINT) AS sum_k,
         CAST(SUM(k % 10) AS BIGINT) AS sum_last_digit
  FROM b GROUP BY event_type ORDER BY event_type
"""


def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value is split
    EQUALLY across the user's view/click touches in the preceding
    {ATTR_WINDOW_US}-µs window, then rolled up per touch type — the
    fractional-credit complement of ``q_first_touch``/
    ``q_orders_asof_events`` (winner-take-all attribution over- and
    under-credits channels; linear credit is the standard baseline).

    Exactness: per purchase, each type's credit is
    value_fix·n_type div n_total — one integer division per
    (purchase, type), no per-touch rational sums, so the rollup is an
    exact bigint on both engines. Shape: the same bucketed range join
    as q_first_touch (equi-join on (user, bucket), never an
    inequality nested loop); everything after is partial-aggregated
    groupBys on (purchase, type) then (type) — at 100 TB the credit
    table is |purchases × types|, never |touches|.
    """
    from locopy_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    points = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        ts_us.alias("p_us"),
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.expr("cast(floor(value * 1000 + 0.5) as bigint)").alias(
            "value_fix"
        ),
        (ts_us - F.lit(ATTR_WINDOW_US)).alias("lo_us"),
        ts_us.alias("hi_us"),
    )
    cands = range_join(
        points,
        intervals,
        point_col="p_us",
        lo_col="lo_us",
        hi_col="hi_us",
        bucket=ATTR_WINDOW_US,
        keys=["user_id"],
    )
    # one exchange for the whole closing device (r12, guide §2.4) —
    # see q_attribution_decay: purchase_id pre-partitioning serves the
    # grouped aggregate and the per-purchase total window, dropping
    # the total-groupBy + data-sized sort-merge join
    from pyspark.sql import Window as W

    per_type = (
        cands.repartition("purchase_id")
        .groupBy("purchase_id", "value_fix", "touch_type")
        .agg(F.count(F.lit(1)).alias("n_type"))
    )
    credited = per_type.withColumn(
        "n_total", F.sum("n_type").over(W.partitionBy("purchase_id"))
    ).select(
        "touch_type",
        "purchase_id",
        F.expr("value_fix * n_type div n_total").alias("credit_fix"),
    )
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count_distinct("purchase_id").alias("n_purchases"),
            F.sum("credit_fix").alias("credit_fix"),
        )
        .withColumn(
            "credit", F.expr("cast(credit_fix as double) / 1000.0")
        )
        .orderBy("touch_type")
    )


ORACLE["q_attribution_linear"] = f"""
  WITH c AS (
    SELECT p.event_id AS purchase_id,
           CAST(FLOOR(p.value * 1000 + 0.5) AS BIGINT) AS value_fix,
           x.event_type AS touch_type
    FROM events p JOIN events x
      ON p.event_type = 'purchase'
     AND x.event_type IN ('view', 'click')
     AND x.user_id = p.user_id
     AND epoch_us(x.ts) >= epoch_us(p.ts) - {ATTR_WINDOW_US}
     AND epoch_us(x.ts) < epoch_us(p.ts)
  ),
  per_type AS (
    SELECT purchase_id, value_fix, touch_type, COUNT(*) AS n_type
    FROM c GROUP BY 1, 2, 3
  ),
  totals AS (
    SELECT purchase_id, CAST(SUM(n_type) AS BIGINT) AS n_total
    FROM per_type GROUP BY 1
  )
  SELECT pt.touch_type,
         COUNT(DISTINCT pt.purchase_id) AS n_purchases,
         CAST(SUM(pt.value_fix * pt.n_type // t.n_total) AS BIGINT)
           AS credit_fix,
         CAST(CAST(SUM(pt.value_fix * pt.n_type // t.n_total) AS BIGINT)
              AS DOUBLE) / 1000.0 AS credit
  FROM per_type pt JOIN totals t ON pt.purchase_id = t.purchase_id
  GROUP BY 1 ORDER BY 1
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by FIRST-order month,
    with per-month-offset active counts, revenue, and the cumulative
    LTV curve — the value companion of ``q_retention_cohorts`` (which
    counts activity; finance wants the spend curve those users trace).

    Months live as a linear index (year·12+month−1) so offsets are
    exact integer subtraction. Two corpus shuffles build the
    (customer, month) spend table and its per-customer month list
    (cohort month = array_min — no self-join back to find the first
    order); the cumulative window runs per cohort over ≤|months| rows,
    bounded at any SF. Revenue is exact scaled bigints; the output
    doubles are single divisions of exact sums.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cm = (
        o.select(
            "o_custkey",
            F.expr(
                "year(o_orderdate) * 12 + month(o_orderdate) - 1"
            ).alias("m"),
            F.expr(
                f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)"
            ).alias("rev_fix"),
        )
        .groupBy("o_custkey", "m")
        .agg(F.sum("rev_fix").alias("rev_fix"))
    )
    per_cust = per_cm.groupBy("o_custkey").agg(
        F.collect_list(F.struct("m", "rev_fix")).alias("months")
    )
    exploded = per_cust.select(
        F.expr("array_min(transform(months, x -> x.m))").alias("cohort_m"),
        F.explode("months").alias("mm"),
    ).select(
        "cohort_m",
        (F.col("mm.m") - F.col("cohort_m")).cast("long").alias(
            "month_offset"
        ),
        F.col("mm.rev_fix").alias("rev_fix"),
    )
    agg = exploded.groupBy("cohort_m", "month_offset").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev_fix").alias("rev_fix"),
    )
    w = (
        W.partitionBy("cohort_m")
        .orderBy("month_offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        agg.withColumn("cum_fix", F.sum("rev_fix").over(w))
        .select(
            F.expr(
                "cast((cohort_m div 12) * 100 + (cohort_m % 12) + 1"
                " as bigint)"
            ).alias("cohort_ym"),
            "month_offset",
            "n_customers",
            F.expr(f"cast(rev_fix as double) / {SCALE}.0").alias("revenue"),
            F.expr(f"cast(cum_fix as double) / {SCALE}.0").alias(
                "cum_revenue"
            ),
        )
        .orderBy("cohort_ym", "month_offset")
    )


ORACLE["q_cohort_ltv"] = f"""
  WITH per_cm AS (
    SELECT o_custkey,
           year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS rev_fix
    FROM orders GROUP BY 1, 2
  ),
  cohort AS (
    SELECT o_custkey, MIN(m) AS cohort_m FROM per_cm GROUP BY 1
  ),
  ex AS (
    SELECT c.cohort_m, p.m - c.cohort_m AS month_offset, p.rev_fix
    FROM per_cm p JOIN cohort c ON p.o_custkey = c.o_custkey
  ),
  agg AS (
    SELECT cohort_m, month_offset,
           COUNT(*) AS n_customers,
           CAST(SUM(rev_fix) AS BIGINT) AS rev_fix
    FROM ex GROUP BY 1, 2
  )
  SELECT CAST((cohort_m // 12) * 100 + (cohort_m % 12) + 1 AS BIGINT)
           AS cohort_ym,
         CAST(month_offset AS BIGINT) AS month_offset,
         n_customers,
         CAST(rev_fix AS DOUBLE) / {SCALE}.0 AS revenue,
         CAST(CAST(SUM(rev_fix) OVER (
                PARTITION BY cohort_m ORDER BY month_offset
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS BIGINT) AS DOUBLE) / {SCALE}.0 AS cum_revenue
  FROM agg ORDER BY cohort_ym, month_offset
"""


# -- top user journeys --------------------------------------------------------

PATH_MAX_EVENTS = 20  # bound the per-user-day journey string
PATH_TOP_K = 20


def q_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOP_K} daily user journeys: each (user, day)'s first
    {PATH_MAX_EVENTS} event types in time order, joined into a '>'
    path string, ranked by frequency — the product-analytics "common
    flows" report.

    Determinism: per-key order is the total order (ts_µs, event_id);
    Spark materializes it via array_sort over (ts, id, type) structs
    (collect_list order is NOT deterministic — the sort makes it so),
    DuckDB via ORDER BY inside list(). The event cap bounds both the
    struct buffer and the path string at planet scale (a user-day is
    already small; the cap is a guard, not a sampler, and is applied
    AFTER the in-group sort so both engines cut the same prefix).
    Ties in frequency break on the path string for a stable top-k.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    paths = (
        e.select(
            "user_id",
            (ts_us.cast("long") - (ts_us.cast("long") % F.lit(86_400_000_000)))
            .alias("day_us"),
            F.struct(
                ts_us.alias("ts_us"), F.col("event_id"), F.col("event_type")
            ).alias("ev"),
        )
        .groupBy("user_id", "day_us")
        .agg(
            F.array_join(
                F.transform(
                    F.slice(
                        F.array_sort(F.collect_list("ev")),
                        1,
                        PATH_MAX_EVENTS,
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_user_days"))
        .orderBy(F.desc("n_user_days"), "path")
        .limit(PATH_TOP_K)
    )


ORACLE["q_top_paths"] = f"""
  WITH p AS (
    SELECT user_id,
           epoch_us(ts) - (epoch_us(ts) % 86400000000) AS day_us,
           array_to_string(
             list_slice(
               list(event_type ORDER BY epoch_us(ts), event_id),
               1, {PATH_MAX_EVENTS}
             ), '>'
           ) AS path
    FROM events GROUP BY 1, 2
  )
  SELECT path, COUNT(*) AS n_user_days
  FROM p GROUP BY 1
  ORDER BY n_user_days DESC, path
  LIMIT {PATH_TOP_K}
"""


# -- view→purchase lead-lag cross-correlation ---------------------------------

XCORR_MAX_LAG = 6
XCORR_A = "view"
XCORR_B = "purchase"


def q_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly cross-correlation between {XCORR_A} and {XCORR_B}
    volume at lags −{XCORR_MAX_LAG}..+{XCORR_MAX_LAG} — the lead-lag
    fingerprint behind "purchases follow views by k hours" claims
    (positive lag = {XCORR_B} lags {XCORR_A}).

    The raw events partial-aggregate once to per-(hour, side) counts;
    the hour axis zero-fills over the DENSE [min, max] hour range
    (missing hours are real zeros — skipping them biases r), which is
    |hours|-sized and bounded by the time span, not data volume. Lag
    pairs come from one broadcast lag-table equi-join (the q_autocorr
    shape); per-lag exact bigint moments close through the shared
    Pearson expression with the exact integer variance guard.
    """
    e = load_table(spark, sf_dir, "events")
    return xcorr_report(xcorr_state(e))


def xcorr_state(events: DataFrame) -> DataFrame:
    """Additive lead-lag state ``(hour, is_a, c)`` — per-(hour, side)
    counts merge by key, so a streaming maintainer
    (``streaming.stateful.stream_xcorr``) holds exactly this
    |hours|×2 table."""
    hour = F.expr(f"({sql_epoch_us(events, 'ts')}) div 3600000000")
    return (
        events.filter(F.col("event_type").isin([XCORR_A, XCORR_B]))
        .groupBy(
            hour.alias("hour"),
            (F.col("event_type") == XCORR_A).alias("is_a"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )


def xcorr_report(counts: DataFrame) -> DataFrame:
    """The dense-fill + lag-moment finisher over the hourly state —
    shared by the batch query and the streaming state view."""
    spark = counts.sparkSession
    bounds = counts.agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(h0, h1)")).alias("hour")
    )
    # broadcast hints (r12, §3.1): every side here is |hours|-bounded
    # (the docstring's span argument), but the estimates through the
    # fact aggregate kept one join sort-merge
    series = (
        hours.join(
            F.broadcast(
                counts.filter("is_a").select("hour", F.col("c").alias("x"))
            ),
            "hour",
            "left",
        )
        .join(
            F.broadcast(
                counts.filter("not is_a").select(
                    "hour", F.col("c").alias("y")
                )
            ),
            "hour",
            "left",
        )
        .select(
            "hour",
            F.coalesce("x", F.lit(0)).alias("x"),
            F.coalesce("y", F.lit(0)).alias("y"),
        )
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").alias("lag")
    )
    shifted = series.select("hour", "x").crossJoin(F.broadcast(lags)).select(
        "lag", "x", (F.col("hour") + F.col("lag")).alias("hour")
    )
    pairs = shifted.join(
        F.broadcast(series.select("hour", "y")), "hour"
    ).select("lag", "x", "y")
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS BIGINT)").alias("sxy"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS BIGINT)").alias("sx2"),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS BIGINT)").alias("sy2"),
    )
    corr = (
        "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    var_ok = (
        "CAST(n AS DECIMAL(38,0)) * {s2} > CAST({s} AS DECIMAL(38,0)) * {s}"
    )
    return (
        agg.filter(
            F.expr(var_ok.format(s2="sx2", s="sx"))
            & F.expr(var_ok.format(s2="sy2", s="sy"))
        )
        .select("lag", "n", F.expr(corr).alias("xcorr"))
        .orderBy("lag")
    )


ORACLE["q_xcorr"] = f"""
  WITH counts AS (
    SELECT epoch_us(ts) // 3600000000 AS hour,
           event_type = '{XCORR_A}' AS is_a,
           COUNT(*) AS c
    FROM events
    WHERE event_type IN ('{XCORR_A}', '{XCORR_B}')
    GROUP BY 1, 2
  ),
  hours AS (
    SELECT UNNEST(generate_series(MIN(hour), MAX(hour))) AS hour FROM counts
  ),
  series AS (
    SELECT h.hour,
           COALESCE(a.c, 0) AS x,
           COALESCE(b.c, 0) AS y
    FROM hours h
    LEFT JOIN (SELECT hour, c FROM counts WHERE is_a) a ON a.hour = h.hour
    LEFT JOIN (SELECT hour, c FROM counts WHERE NOT is_a) b ON b.hour = h.hour
  ),
  pairs AS (
    SELECT l.lag, s.x, t.y
    FROM series s
    CROSS JOIN (SELECT UNNEST(generate_series(-{XCORR_MAX_LAG},
                                              {XCORR_MAX_LAG})) AS lag) l
    JOIN series t ON t.hour = s.hour + l.lag
  ),
  agg AS (
    SELECT lag, COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(CAST(x AS HUGEINT) * y) AS BIGINT) AS sxy,
           CAST(SUM(CAST(x AS HUGEINT) * x) AS BIGINT) AS sx2,
           CAST(SUM(CAST(y AS HUGEINT) * y) AS BIGINT) AS sy2
    FROM pairs GROUP BY lag
  )
  SELECT lag, n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         * sqrt(CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           AS xcorr
  FROM agg
  WHERE CAST(n AS HUGEINT) * sx2 > CAST(sx AS HUGEINT) * sx
    AND CAST(n AS HUGEINT) * sy2 > CAST(sy AS HUGEINT) * sy
  ORDER BY lag
"""


# -- inter-purchase cycle time ------------------------------------------------

def q_interpurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cycle time per market segment: day gaps between
    each customer's consecutive orders — the replenishment-cadence
    read behind "when do we expect them back".

    Per-customer sequences are short and bounded (the
    q_event_transitions shape), so the lag window shuffles once on
    the customer key; the segment-level exact median gap uses
    operators.ranking.grouped_global_row_number (range-partitioned —
    no one-task-per-segment sort of the gap table); mean closes as
    one double division of exact bigints. Total order (o_orderdate,
    o_orderkey) makes same-day ties deterministic.
    """
    from locopy_spark.operators.ranking import grouped_global_row_number

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    day = F.expr("datediff(cast(o_orderdate as date), date'1970-01-01')")
    w = W.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        o.select("o_custkey", "o_orderkey", day.alias("day"))
        .withColumn("prev_day", F.lag("day").over(w))
        .filter(F.col("prev_day").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            (F.col("day") - F.col("prev_day")).cast("long").alias("gap"),
        )
        .join(
            c.select(
                F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
            ),
            "o_custkey",
        )
    )
    ranked = grouped_global_row_number(
        gaps,
        group_cols=["c_mktsegment"],
        order_cols=["gap", "o_custkey", "o_orderkey"],
        out_col="rn",
        size_col="n",
    )
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.max("n").alias("n_gaps"),
            F.expr(
                "CAST(SUM(gap) AS DOUBLE) / COUNT(*)"
            ).alias("mean_gap_days"),
            F.max(
                F.expr(
                    "case when rn = cast(ceil(0.5 * n) as bigint)"
                    " then gap end"
                )
            ).alias("median_gap_days"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE["q_interpurchase"] = """
  WITH g AS (
    SELECT o_custkey, o_orderkey,
           datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day
    FROM orders
  ),
  gaps AS (
    SELECT o_custkey, o_orderkey,
           day - LAG(day) OVER (
             PARTITION BY o_custkey ORDER BY day, o_orderkey
           ) AS gap
    FROM g
  ),
  seg AS (
    SELECT c_mktsegment, gap, o_custkey, o_orderkey
    FROM gaps JOIN customer ON o_custkey = c_custkey
    WHERE gap IS NOT NULL
  ),
  r AS (
    SELECT c_mktsegment, gap,
           ROW_NUMBER() OVER (
             PARTITION BY c_mktsegment
             ORDER BY gap, o_custkey, o_orderkey
           ) AS rn,
           COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
    FROM seg
  )
  SELECT c_mktsegment,
         CAST(MAX(n) AS BIGINT) AS n_gaps,
         CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap_days,
         MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                  THEN gap END) AS median_gap_days
  FROM r GROUP BY 1 ORDER BY 1
"""


# -- sequence pattern with negation ------------------------------------------
#
# view -> purchase conversion that is only "clean" when NO error event
# intervenes — the MATCH_RECOGNIZE-style negative pattern (A then B
# with no C between) that plain funnels (q_events_funnel,
# q_funnel_windows) cannot express: they count reachability, not
# clean-path reachability.
PATTERN_WINDOW_US = 7 * 86_400_000_000  # purchase within 7 days


def next_event_epochs(e: DataFrame) -> DataFrame:
    """Per event: the epoch-µs of the user's NEXT purchase and next
    error, strictly after (RANGE 1 FOLLOWING — tie-safe on both
    engines).  The ONE copy of the lookahead scaffolding shared by
    q_pattern_negation and q_time_to_convert."""
    eus = epoch_us(e, "ts")
    w = (
        W.partitionBy("user_id")
        .orderBy("eus")
        .rangeBetween(1, W.unboundedFollowing)
    )
    return (
        e.select("user_id", "event_type", eus.alias("eus"))
        .withColumn(
            "next_p",
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("eus"))
            ).over(w),
        )
        .withColumn(
            "next_e",
            F.min(
                F.when(F.col("event_type") == "error", F.col("eus"))
            ).over(w),
        )
    )


def q_pattern_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean-path conversion by weekday of the view: for every view,
    the NEXT purchase by the same user within 7 days converts, and the
    conversion is CLEAN only when no error event strictly intervenes
    (view < error < purchase blocks it).

    One |events| window per user computes next-purchase /next-error
    epochs with a RANGE (1 FOLLOWING .. UNBOUNDED) frame — strict
    "after" even under same-microsecond ties, identical semantics on
    both engines (a ROWS frame would be tie-order dependent).  The
    rollup is a 7-row weekday aggregate with exact ppm shares; event
    payloads never shuffle twice (one hash exchange on user_id, one on
    the 7-key weekday).
    """
    nxt = next_event_epochs(load_table(spark, sf_dir, "events"))
    views = nxt.filter(F.col("event_type") == "view").select(
        F.expr(
            f"(((eus div {US_PER_DAY}) + 4) % 7 + 7) % 7"
        ).alias("weekday"),
        F.expr(
            f"cast(next_p IS NOT NULL AND next_p - eus <= {PATTERN_WINDOW_US}"
            " as int)"
        ).alias("conv"),
        F.expr("cast(next_e IS NOT NULL AND next_e < next_p as int)").alias(
            "blocked"
        ),
    )
    return (
        views.groupBy("weekday")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum("conv").alias("n_conv"),
            F.sum(
                F.expr("cast(conv = 1 AND blocked = 0 as int)")
            ).alias("n_clean"),
        )
        .select(
            "weekday",
            "n_views",
            "n_conv",
            "n_clean",
            F.expr(
                "CAST(CAST(n_conv AS DECIMAL(38,0)) * 1000000"
                " div n_views AS BIGINT)"
            ).alias("conv_ppm"),
            F.expr(
                "CAST(CAST(n_clean AS DECIMAL(38,0)) * 1000000"
                " div n_views AS BIGINT)"
            ).alias("clean_ppm"),
        )
        .orderBy("weekday")
    )


ORACLE["q_pattern_negation"] = f"""
  WITH base AS (
    SELECT user_id, event_type, epoch_us(ts) AS eus FROM events
  ),
  nxt AS (
    SELECT user_id, event_type, eus,
           MIN(CASE WHEN event_type = 'purchase' THEN eus END) OVER (
             PARTITION BY user_id ORDER BY eus
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS next_p,
           MIN(CASE WHEN event_type = 'error' THEN eus END) OVER (
             PARTITION BY user_id ORDER BY eus
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS next_e
    FROM base
  ),
  v AS (
    SELECT (((eus // {US_PER_DAY}) + 4) % 7 + 7) % 7 AS weekday,
           CAST(next_p IS NOT NULL
                AND next_p - eus <= {PATTERN_WINDOW_US} AS INT) AS conv,
           CAST(next_e IS NOT NULL AND next_e < next_p AS INT) AS blocked
    FROM nxt WHERE event_type = 'view'
  ),
  g AS (
    SELECT weekday, COUNT(*) AS n_views,
           CAST(SUM(conv) AS BIGINT) AS n_conv,
           CAST(SUM(CASE WHEN conv = 1 AND blocked = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
    FROM v GROUP BY 1
  )
  SELECT weekday, n_views, n_conv, n_clean,
         CAST(CAST(n_conv AS HUGEINT) * 1000000 // n_views AS BIGINT)
           AS conv_ppm,
         CAST(CAST(n_clean AS HUGEINT) * 1000000 // n_views AS BIGINT)
           AS clean_ppm
  FROM g ORDER BY weekday
"""


# -- peak session concurrency -------------------------------------------------
#
# The capacity-planning read: how many gap-based sessions are active
# at once, per day.  The classic sweep line — +1 at session start, -1
# one microsecond after session end — closed with the repo's
# range-partitioned exact prefix sum instead of a one-partition
# window.


def q_sessions_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day PEAK concurrent sessions (30-min gap sessions, the
    q_events_sessionize definition): sweep-line deltas aggregated per
    microsecond, one exact global running sum
    (operators/ranking.global_running_sum — range-partitioned, no
    single-task sort), day peak = max over the day's change points of
    GREATEST(carry-in, post-change value), so sessions spanning
    midnight count against the day they carry into.  Closure
    convention: the carry-in value counts toward the day of the
    day's FIRST change point even when that change lands exactly on
    the µs day boundary (a generative property test pins the device
    against an independent scan under this convention, including the
    boundary corner).

    Scale shape: sessionization is one shuffle on the user key; the
    delta table is 2 rows per session; the prefix sum shuffles the
    |change points| aggregate once by range.  Days with no change
    point hold the previous value and are omitted (constant curve).
    """
    from locopy_spark.operators.ranking import global_running_sum
    from locopy_spark.operators.sessionize import session_stats

    e = load_table(spark, sf_dir, "events")
    s = session_stats(e, gap_minutes=30)
    # both sweep deltas from ONE pass (r11): the unionAll form
    # computed session_stats (a user-key shuffle + window) once per
    # branch; the row-local explode emits the +1/−1 rows together
    deltas = s.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("session_start_us").alias("eus"),
                    F.lit(1).alias("d"),
                ),
                F.struct(
                    (F.col("session_end_us") + 1).alias("eus"),
                    F.lit(-1).alias("d"),
                ),
            )
        ).alias("x")
    ).select("x.eus", "x.d")
    nets = deltas.groupBy("eus").agg(F.sum("d").alias("net"))
    run = global_running_sum(nets, ["eus"], "net", out_col="carry_in")
    return (
        run.select(
            F.expr(f"eus div {US_PER_DAY}").alias("day"),
            F.greatest(
                F.col("carry_in"), F.col("carry_in") + F.col("net")
            ).alias("v"),
        )
        .groupBy("day")
        .agg(F.max("v").alias("peak_concurrency"))
        .orderBy("day")
    )


ORACLE["q_sessions_concurrent"] = f"""
  WITH e AS (
    SELECT user_id, event_id, epoch_us(ts) AS t FROM events
  ),
  f AS (
    SELECT *, CASE WHEN t - lag(t) OVER (
                     PARTITION BY user_id ORDER BY t, event_id)
                   > {30 * 60 * 1_000_000} THEN 1 ELSE 0 END AS ns
    FROM e
  ),
  s AS (
    SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS session_id
    FROM f
  ),
  b AS (
    SELECT user_id, session_id, MIN(t) AS st, MAX(t) AS en
    FROM s GROUP BY 1, 2
  ),
  deltas AS (
    SELECT st AS eus, 1 AS d FROM b
    UNION ALL SELECT en + 1, -1 FROM b
  ),
  nets AS (SELECT eus, SUM(d) AS net FROM deltas GROUP BY 1),
  run AS (
    SELECT eus, net,
           COALESCE(SUM(net) OVER (ORDER BY eus
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS carry_in
    FROM nets
  )
  SELECT eus // {US_PER_DAY} AS day,
         CAST(MAX(GREATEST(carry_in, carry_in + net)) AS BIGINT)
           AS peak_concurrency
  FROM run GROUP BY 1 ORDER BY day
"""


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase latency distribution per weekday of the view
    (the "how long until they buy" complement of q_pattern_negation's
    "do they buy cleanly"): exact median and p90 latency in
    microseconds over converted views, plus the exact-bigint mean.

    Shares the ``next_event_epochs`` lookahead; order statistics come
    from operators/ranking.grouped_global_row_number (range-
    partitioned — no single-task per-weekday sort).  Rank-k latency
    is tie-order invariant (equal latencies yield the same value at
    any rank inside the tie run), so no further tiebreak column is
    needed for exactness.
    """
    from locopy_spark.operators.ranking import grouped_global_row_number

    nxt = next_event_epochs(load_table(spark, sf_dir, "events"))
    conv = (
        nxt.filter(F.col("event_type") == "view")
        .filter(
            F.expr(f"next_p IS NOT NULL AND next_p - eus <= {PATTERN_WINDOW_US}")
        )
        .select(
            F.expr(
                f"(((eus div {US_PER_DAY}) + 4) % 7 + 7) % 7"
            ).alias("weekday"),
            (F.col("next_p") - F.col("eus")).alias("latency_us"),
        )
    )
    ranked = grouped_global_row_number(
        conv,
        group_cols=["weekday"],
        order_cols=["latency_us"],
        out_col="rn",
        size_col="n",
    )
    return (
        ranked.groupBy("weekday")
        .agg(
            F.max("n").alias("n_conv"),
            F.max(
                F.expr(
                    "case when rn = cast(ceil(0.5 * n) as bigint)"
                    " then latency_us end"
                )
            ).alias("median_latency_us"),
            F.max(
                F.expr(
                    "case when rn = cast(ceil(0.9 * n) as bigint)"
                    " then latency_us end"
                )
            ).alias("p90_latency_us"),
            F.expr("CAST(SUM(latency_us) AS DOUBLE) / COUNT(*)").alias(
                "mean_latency_us"
            ),
        )
        .orderBy("weekday")
    )


ORACLE["q_time_to_convert"] = f"""
  WITH base AS (
    SELECT user_id, event_type, epoch_us(ts) AS eus FROM events
  ),
  nxt AS (
    SELECT user_id, event_type, eus,
           MIN(CASE WHEN event_type = 'purchase' THEN eus END) OVER (
             PARTITION BY user_id ORDER BY eus
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS next_p
    FROM base
  ),
  conv AS (
    SELECT (((eus // {US_PER_DAY}) + 4) % 7 + 7) % 7 AS weekday,
           next_p - eus AS latency_us
    FROM nxt
    WHERE event_type = 'view' AND next_p IS NOT NULL
      AND next_p - eus <= {PATTERN_WINDOW_US}
  ),
  r AS (
    SELECT weekday, latency_us,
           ROW_NUMBER() OVER (
             PARTITION BY weekday ORDER BY latency_us
           ) AS rn,
           COUNT(*) OVER (PARTITION BY weekday) AS n
    FROM conv
  )
  SELECT weekday, CAST(MAX(n) AS BIGINT) AS n_conv,
         MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
             THEN latency_us END) AS median_latency_us,
         MAX(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
             THEN latency_us END) AS p90_latency_us,
         CAST(SUM(latency_us) AS DOUBLE) / COUNT(*) AS mean_latency_us
  FROM r GROUP BY 1 ORDER BY weekday
"""


CONV_WINDOWS_S = (3600, 21600, 86400, 259200, 604800)  # 1h 6h 1d 3d 7d


def q_conversion_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-vs-window operating curve: the share of views whose
    NEXT purchase lands within 1 h / 6 h / 1 d / 3 d / 7 d — the read
    that picks an attribution window before anyone runs
    q_pattern_negation/q_time_to_convert at a fixed 7 d.  One pass
    over the shared ``next_event_epochs`` lookahead, five conditional
    sums in a single 1-row aggregate, unpivoted to the 5-row curve
    (cumulative by construction).  Exact ppm integers.
    """
    nxt = next_event_epochs(load_table(spark, sf_dir, "events"))
    views = nxt.filter(F.col("event_type") == "view").select(
        F.expr("next_p - eus").alias("latency_us")
    )
    aggs = [F.count(F.lit(1)).alias("n_views")] + [
        F.sum(
            F.expr(
                "cast(latency_us IS NOT NULL"
                f" AND latency_us <= {w * 1_000_000} as int)"
            )
        ).alias(f"c{w}")
        for w in CONV_WINDOWS_S
    ]
    one = views.agg(*aggs)
    stack = ", ".join(f"{w}, c{w}" for w in CONV_WINDOWS_S)
    return (
        one.select(
            F.expr(
                f"stack({len(CONV_WINDOWS_S)}, {stack})"
                " as (window_s, n_conv)"
            ),
            "n_views",
        )
        .select(
            F.col("window_s").cast("long").alias("window_s"),
            "n_views",
            F.col("n_conv").cast("long").alias("n_conv"),
            F.expr(
                "CAST(CAST(n_conv AS DECIMAL(38,0)) * 1000000"
                " div n_views AS BIGINT)"
            ).alias("conv_ppm"),
        )
        .orderBy("window_s")
    )


def _conv_curve_oracle() -> str:
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN latency_us IS NOT NULL AND latency_us <="
        f" {w * 1_000_000} THEN 1 ELSE 0 END) AS BIGINT) AS c{w}"
        for w in CONV_WINDOWS_S
    )
    rows = " UNION ALL ".join(
        f"SELECT {w} AS window_s, n_views, c{w} AS n_conv FROM one"
        for w in CONV_WINDOWS_S
    )
    return f"""
  WITH base AS (
    SELECT user_id, event_type, epoch_us(ts) AS eus FROM events
  ),
  nxt AS (
    SELECT event_type,
           MIN(CASE WHEN event_type = 'purchase' THEN eus END) OVER (
             PARTITION BY user_id ORDER BY eus
             RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) - eus AS latency_us
    FROM base
  ),
  v AS (SELECT latency_us FROM nxt WHERE event_type = 'view'),
  one AS (SELECT COUNT(*) AS n_views, {sums} FROM v)
  SELECT CAST(window_s AS BIGINT) AS window_s, n_views, n_conv,
         CAST(CAST(n_conv AS HUGEINT) * 1000000 // n_views AS BIGINT)
           AS conv_ppm
  FROM ({rows}) ORDER BY window_s
"""


ORACLE["q_conversion_curve"] = _conv_curve_oracle()


def q_co_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-engagement lift matrix over WEEKLY activity
    baskets (the market-basket device on behavior instead of parts):
    basket = (user, week); for each type pair (a, b), the baskets
    containing both and the exact-ppm lift
    ``n_both·n_baskets·1e6 div (n_a·n_b)`` — lift > 1e6 means the
    behaviors attract within a week, < 1e6 they repel.  (Lifetime
    baskets are degenerate here — every active user eventually does
    every type — so the weekly granularity is what makes the matrix
    informative, the same reason basket analysis uses orders, not
    customers.)

    One distinct (user, week, type) projection, self-joined on the
    basket key — co-partitioned, no shuffle beyond the first — into
    a ≤|types|²-row matrix; the basket total rides as a 1-row
    broadcast.  DECIMAL(38) headroom on the triple product.
    """
    from locopy_spark.functions.cache import managed_persist

    e = load_table(spark, sf_dir, "events")
    ut = managed_persist(co_engagement_state(e), "co_engagement")
    return co_engagement_report(ut)


def co_engagement_state(e: DataFrame) -> DataFrame:
    """Distinct (user, week, type) rows — a SET (idempotent
    union+distinct), the state shared with the streaming twin."""
    from locopy_spark.functions.numeric import sql_epoch_us

    wk = f"({sql_epoch_us(e, 'ts')}) div {7 * US_PER_DAY}"
    return e.select(
        "user_id", F.expr(wk).alias("wk"), "event_type"
    ).distinct()


def co_engagement_report(ut: DataFrame) -> DataFrame:
    """Lift-matrix finisher over the (user, week, type) state."""
    per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    n_users = ut.select("user_id", "wk").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    pairs = (
        ut.select("user_id", "wk", F.col("event_type").alias("a"))
        .join(
            ut.select("user_id", "wk", F.col("event_type").alias("b")),
            ["user_id", "wk"],
        )
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        pairs.join(
            F.broadcast(
                per_type.select(F.col("event_type").alias("a"),
                                F.col("n_t").alias("n_a"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                per_type.select(F.col("event_type").alias("b"),
                                F.col("n_t").alias("n_b"))
            ),
            "b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "a",
            "b",
            "n_both",
            "n_a",
            "n_b",
            F.expr(
                "CAST(CAST(n_both AS DECIMAL(38,0)) * n_users * 1000000"
                " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("a", "b")
    )


ORACLE["q_co_engagement"] = """
  WITH ut AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk,
           event_type
    FROM events
  ),
  per_type AS (
    SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1
  ),
  nu AS (
    SELECT COUNT(*) AS n_users
    FROM (SELECT DISTINCT user_id, wk FROM ut)
  ),
  pairs AS (
    SELECT x.event_type AS a, y.event_type AS b, COUNT(*) AS n_both
    FROM ut x JOIN ut y
      ON x.user_id = y.user_id AND x.wk = y.wk
     AND x.event_type < y.event_type
    GROUP BY 1, 2
  )
  SELECT a, b, n_both,
         ta.n_t AS n_a, tb.n_t AS n_b,
         CAST(CAST(n_both AS HUGEINT) * n_users * 1000000
              // (CAST(ta.n_t AS HUGEINT) * tb.n_t) AS BIGINT)
           AS lift_ppm
  FROM pairs
  JOIN per_type ta ON ta.event_type = a
  JOIN per_type tb ON tb.event_type = b
  CROSS JOIN nu
  ORDER BY a, b
"""


# -- sessionization gap operating curve -------------------------------------

GAP_CURVE_MINUTES = (5, 15, 30, 60, 180)


def q_session_gap_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session count as a function of the inactivity-gap threshold —
    the operating curve that PICKS the sessionization parameter
    q_events_sessionize then fixes at 30 min (the q_conversion_curve
    pattern: sweep the knob in one pass before committing to it).

    A session starts where the per-user inter-event gap exceeds the
    threshold, so n_sessions(G) = Σ 1[first event or gap > G] — all
    five thresholds close from ONE lag projection (one per-user
    shuffle, the window ordered by (epoch µs, event_id) so same-µs
    ties cannot flip a gap across engines), five conditional sums,
    one 1-row aggregate unpivoted to the curve. Adding a threshold
    costs one more counter, not another pass.
    """
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    lagged = e.select(
        "user_id", "event_id", epoch_us(e, "ts").alias("us")
    ).select("us", F.lag("us").over(w).alias("prev_us"))
    aggs = [
        F.sum(
            F.expr(
                "case when prev_us is null"
                f" or us - prev_us > {g * 60 * 1_000_000}"
                " then 1 else 0 end"
            )
        ).alias(f"s{g}")
        for g in GAP_CURVE_MINUTES
    ]
    row = lagged.agg(*aggs)
    cells = ", ".join(f"{g}L, s{g}" for g in GAP_CURVE_MINUTES)
    return row.selectExpr(
        f"stack({len(GAP_CURVE_MINUTES)}, {cells})"
        " as (gap_minutes, n_sessions)"
    ).orderBy("gap_minutes")


def _gap_curve_oracle() -> str:
    sums = ",\n           ".join(
        f"SUM(CASE WHEN prev_us IS NULL"
        f" OR us - prev_us > {g * 60 * 1_000_000}"
        f" THEN 1 ELSE 0 END) AS s{g}"
        for g in GAP_CURVE_MINUTES
    )
    rows = "\n    UNION ALL ".join(
        f"SELECT CAST({g} AS BIGINT) AS gap_minutes,"
        f" CAST(s{g} AS BIGINT) AS n_sessions FROM a"
        for g in GAP_CURVE_MINUTES
    )
    return f"""
  WITH l AS (
    SELECT epoch_us(ts) AS us,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id) AS prev_us
    FROM events
  ),
  a AS (
    SELECT {sums}
    FROM l
  )
  SELECT * FROM ({rows}) ORDER BY gap_minutes
"""


ORACLE["q_session_gap_curve"] = _gap_curve_oracle()


# -- Markov stationary distribution ------------------------------------------

MS_ITERS = 12  # fixed power-iteration rounds = fixed plan/CTE depth


def transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (from_type, to_type, n_trans, n_from) transition matrix of
    consecutive per-user events — the shared scaffolding of
    q_event_transitions and q_markov_stationary. One shuffle to the
    user key for the lag window, then a |types|²-bounded aggregate."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        e.select("user_id", "event_id", "event_type", ts_us.alias("ts_us"))
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    from_tot = pairs.groupBy("from_type").agg(
        F.sum("n_trans").alias("n_from")
    )
    return pairs.join(F.broadcast(from_tot), "from_type")


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain: where
    does a user's session settle in the long run? — the one-number-
    per-state summary of q_event_transitions' full matrix (the read a
    product team uses to rank steady-state engagement surfaces).

    Engine-exact power method (the q_pagerank device on a bounded
    matrix): π starts uniform in ppb, and each of the {MS_ITERS} fixed
    rounds moves integer mass π_f·n_ft div n_f — floors drop mass
    identically on both engines, relative weight is the signal. The
    DuckDB twin unrolls the same rounds as chained CTEs. Scale shape:
    the data-sized work is ONE lag-window pass building the |types|²
    transition matrix; iteration then runs on that bounded table as a
    single Arrow task (the q_kaplan_meier bounded-sequential regime) —
    at any SF the matrix stays |event types|², so iterating it is
    metadata work, not data work.
    """
    mat = transition_counts(spark, sf_dir)

    def power(pdf):
        import pandas as pd

        types = sorted(set(pdf["from_type"]) | set(pdf["to_type"]))
        pi = {t: 10**9 // len(types) for t in types}
        rows = list(
            zip(pdf["from_type"], pdf["to_type"], pdf["n_trans"], pdf["n_from"])
        )
        for _ in range(MS_ITERS):
            nxt = {t: 0 for t in types}
            for f, t, n_ft, n_f in rows:
                nxt[t] += int(pi[f]) * int(n_ft) // int(n_f)
            pi = nxt
        return pd.DataFrame(
            {"event_type": types, "pi_ppb": [pi[t] for t in types]}
        )

    out = (
        mat.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(power, "event_type string, pi_ppb long")
    )
    return out.select("event_type", "pi_ppb").orderBy("event_type")


def _sql_markov_stationary() -> str:
    steps = []
    for i in range(1, MS_ITERS + 1):
        steps.append(
            f"""p{i} AS (
    SELECT ty.t, CAST(COALESCE(c.s, 0) AS BIGINT) AS pi
    FROM ty LEFT JOIN (
      SELECT m.to_type, SUM(p{i - 1}.pi * m.n_trans // f.n_from) AS s
      FROM m JOIN p{i - 1} ON p{i - 1}.t = m.from_type
             JOIN f ON f.from_type = m.from_type
      GROUP BY 1
    ) c ON c.to_type = ty.t
  )"""
        )
    chain = ",\n  ".join(steps)
    return f"""
  WITH s AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ) AS next_type
    FROM events
  ),
  m AS (
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n_trans
    FROM s WHERE next_type IS NOT NULL
    GROUP BY 1, 2
  ),
  f AS (
    SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
    FROM m GROUP BY from_type
  ),
  ty AS (
    SELECT DISTINCT from_type AS t FROM m
    UNION SELECT DISTINCT to_type FROM m
  ),
  p0 AS (
    SELECT t, CAST(1000000000 // (SELECT COUNT(*) FROM ty) AS BIGINT) AS pi
    FROM ty
  ),
  {chain}
  SELECT t AS event_type, pi AS pi_ppb FROM p{MS_ITERS} ORDER BY event_type
"""


ORACLE["q_markov_stationary"] = _sql_markov_stationary()


# -- audience overlap between event types ---------------------------------------


def q_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix between event types (type_a < type_b):
    exact user-set Jaccard in ppm — "do my purchasers also error out,
    or are the error users a disjoint population?" The audience
    counterpart of q_event_transitions' sequence view (transitions say
    what follows; overlap says who is shared at all).

    Exact set algebra on the |users × types| DISTINCT state (one
    partial-aggregated pass), intersections via a self-equi-join on
    the user key (co-partitioned — each user contributes its ≤|types|²
    pairs), unions by inclusion–exclusion from the broadcast
    |types|-bounded audience sizes, one ppm floor division."""
    e = load_table(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            F.expr("a.user_id = b.user_id AND a.event_type < b.event_type"),
        )
        .groupBy(
            F.expr("a.event_type").alias("type_a"),
            F.expr("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_a"),
                                     F.col("n").alias("na"))),
            "type_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("event_type").alias("type_b"),
                                     F.col("n").alias("nb"))),
            "type_b",
        )
        .selectExpr(
            "type_a",
            "type_b",
            "n_shared",
            "na + nb - n_shared as n_union",
            "n_shared * 1000000 div (na + nb - n_shared) as jaccard_ppm",
        )
        .orderBy("type_a", "type_b")
    )


ORACLE["q_type_overlap"] = """
  WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
  sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM ut GROUP BY 1),
  inter AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
  )
  SELECT type_a, type_b, n_shared,
         sa.n + sb.n - n_shared AS n_union,
         CAST(n_shared * 1000000 //
              (sa.n + sb.n - n_shared) AS BIGINT) AS jaccard_ppm
  FROM inter
  JOIN sizes sa ON sa.event_type = type_a
  JOIN sizes sb ON sb.event_type = type_b
  ORDER BY type_a, type_b
"""


# -- Markov removal-effect attribution --------------------------------------------

MA_ITERS = 16  # fixed value-iteration rounds = fixed plan/CTE depth


def attribution_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""The augmented journey transition matrix behind
    q_attribution_markov: per-user event streams split into JOURNEYS
    at each purchase (the purchase becomes the absorbing CONV token,
    the next event starts a new journey), START prepended, and
    non-converting journey tails closed with an explicit NULL edge —
    so every journey is a complete absorbed path and out-degrees sum
    exactly. Two same-key window passes (user, then user×journey) and
    a \|types+3\|²-bounded aggregate."""
    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    w_user = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = (
        e.select("user_id", "event_id", "event_type", ts_us.alias("ts_us"))
        .withColumn(
            "jid",
            F.coalesce(
                F.sum(
                    F.expr(
                        "case when event_type = 'purchase' then 1 else 0 end"
                    )
                ).over(w_user.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "token",
            F.expr(
                "case when event_type = 'purchase' then 'CONV'"
                " else event_type end"
            ),
        )
    )
    wj = W.partitionBy("user_id", "jid").orderBy("ts_us", "event_id")
    seq = base.select(
        "token",
        F.lag("token").over(wj).alias("prev"),
        F.lead("token").over(wj).alias("nxt"),
    )
    edges = seq.selectExpr(
        "coalesce(prev, 'START') AS from_type", "token AS to_type"
    ).unionAll(
        seq.filter("nxt IS NULL AND token != 'CONV'").selectExpr(
            "token AS from_type", "'NULL' AS to_type"
        )
    )
    m = edges.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    f = m.groupBy("from_type").agg(F.sum("n_trans").alias("n_from"))
    return m.join(F.broadcast(f), "from_type")


def q_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Markov removal-effect attribution over user journeys — the
    data-driven alternative to q_first_touch / q_attribution_linear's
    positional rules: a channel's credit is how much the journey
    conversion probability DROPS when every path through that channel
    is severed (Anderl et al.'s framework, the industry-standard
    "Markov attribution").

    Construction: journeys split at purchases (CONV absorbing), tails
    closed with NULL (absorbing); conversion probability = absorption
    mass into CONV from START after {MA_ITERS} fixed value-iteration
    rounds in integer ppb (p ← Σ n_edge·p(next) div n_out — floors
    drop mass identically on both engines); removal r zeroes every
    edge INTO r (mass through r falls to NULL). The DuckDB twin runs
    the SAME iterations with a removal DIMENSION crossed into the
    state (channels+1 chains in one unrolled CTE stack). Scale shape:
    the data-sized work is two same-key window passes building the
    \|types+3\|² matrix; base + all removals then iterate inside ONE
    Arrow task on that bounded table — metadata work at any SF (the
    q_markov_stationary regime).
    """
    mat = attribution_edges(spark, sf_dir)

    def iterate(pdf):
        import pandas as pd

        rows = list(
            zip(pdf["from_type"], pdf["to_type"], pdf["n_trans"],
                pdf["n_from"])
        )
        states = sorted(
            {f for f, *_ in rows} | {t for _, t, *_ in rows}
        )
        channels = [
            s for s in states if s not in ("START", "CONV", "NULL")
        ]

        def conv_prob(removed):
            p = {s: 0 for s in states}
            p["CONV"] = 10**9
            for _ in range(MA_ITERS):
                acc = {s: 0 for s in states}
                for fr, to, n_ft, n_f in rows:
                    v = 0 if to == removed else p[to]
                    acc[fr] += int(n_ft) * int(v)
                nxt = {}
                for s in states:
                    if s == "CONV":
                        nxt[s] = 10**9
                    elif s == "NULL":
                        nxt[s] = 0
                    else:
                        n_f = next(
                            (nf for fr, _, _, nf in rows if fr == s), None
                        )
                        nxt[s] = 0 if n_f is None else acc[s] // int(n_f)
                p = nxt
            return p["START"]

        p_base = conv_prob(None)
        rem = {c: conv_prob(c) for c in channels}
        res = {c: max(0, p_base - rem[c]) for c in channels}
        tot = sum(res.values())
        return pd.DataFrame(
            {
                "event_type": channels,
                "p_base_ppb": [p_base] * len(channels),
                "p_removed_ppb": [rem[c] for c in channels],
                "removal_ppb": [res[c] for c in channels],
                "att_ppm": [
                    res[c] * 10**6 // max(tot, 1) for c in channels
                ],
            }
        )

    out = (
        mat.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(
            iterate,
            "event_type string, p_base_ppb long, p_removed_ppb long,"
            " removal_ppb long, att_ppm long",
        )
    )
    return out.orderBy("event_type")


def _sql_attribution_markov() -> str:
    steps = []
    for i in range(1, MA_ITERS + 1):
        steps.append(
            f"""j{i} AS (
    SELECT pv.r, m.from_type AS t,
           SUM(CAST(m.n_trans AS HUGEINT)
               * CASE WHEN m.to_type = pv.r THEN 0 ELSE pv.p END) AS acc
    FROM m JOIN p{i - 1} pv ON pv.t = m.to_type
    GROUP BY 1, 2
  ),
  p{i} AS (
    SELECT g.r, g.t,
           CASE WHEN g.t = 'CONV' THEN CAST(1000000000 AS HUGEINT)
                WHEN g.t = 'NULL' THEN CAST(0 AS HUGEINT)
                ELSE CAST(COALESCE(j.acc // f.n_from, 0) AS HUGEINT)
           END AS p
    FROM grid g
    LEFT JOIN j{i} j ON j.r = g.r AND j.t = g.t
    LEFT JOIN f ON f.from_type = g.t
  )"""
        )
    chain = ",\n  ".join(steps)
    k = MA_ITERS
    return f"""
  WITH ev AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
  ),
  tok AS (
    SELECT user_id,
           COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                    END) OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS jid,
           CASE WHEN event_type = 'purchase' THEN 'CONV'
                ELSE event_type END AS token,
           us, event_id
    FROM ev
  ),
  seq AS (
    SELECT token,
           LAG(token) OVER (PARTITION BY user_id, jid
                            ORDER BY us, event_id) AS prev,
           LEAD(token) OVER (PARTITION BY user_id, jid
                             ORDER BY us, event_id) AS nxt
    FROM tok
  ),
  edges0 AS (
    SELECT COALESCE(prev, 'START') AS from_type, token AS to_type FROM seq
    UNION ALL
    SELECT token, 'NULL' FROM seq WHERE nxt IS NULL AND token != 'CONV'
  ),
  m AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
    FROM edges0 GROUP BY 1, 2
  ),
  f AS (
    SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
    FROM m GROUP BY 1
  ),
  st AS (
    SELECT DISTINCT from_type AS t FROM m
    UNION SELECT DISTINCT to_type FROM m
  ),
  ch AS (
    SELECT t AS c FROM st WHERE t NOT IN ('START', 'CONV', 'NULL')
  ),
  rm AS (SELECT c AS r FROM ch UNION ALL SELECT '__base__'),
  grid AS (SELECT r, t FROM rm, st),
  p0 AS (
    SELECT r, t,
           CASE WHEN t = 'CONV' THEN CAST(1000000000 AS HUGEINT)
                ELSE CAST(0 AS HUGEINT) END AS p
    FROM grid
  ),
  {chain},
  basep AS (
    SELECT p AS p_base FROM p{k} WHERE r = '__base__' AND t = 'START'
  ),
  res AS (
    SELECT ch.c AS event_type,
           CAST(basep.p_base AS BIGINT) AS p_base_ppb,
           CAST(pr.p AS BIGINT) AS p_removed_ppb,
           CAST(GREATEST(basep.p_base - pr.p, 0) AS BIGINT) AS removal_ppb
    FROM ch JOIN p{k} pr ON pr.r = ch.c AND pr.t = 'START', basep
  )
  SELECT event_type, p_base_ppb, p_removed_ppb, removal_ppb,
         CAST(removal_ppb * 1000000
              // GREATEST(SUM(removal_ppb) OVER (), 1) AS BIGINT)
           AS att_ppm
  FROM res ORDER BY event_type
"""


ORACLE["q_attribution_markov"] = _sql_attribution_markov()


# -- time-decay multi-touch attribution -------------------------------------------

DECAY_HALF_US = ATTR_WINDOW_US // 4  # 4 half-lives across the window


def q_attribution_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decay multi-touch attribution: a purchase's value splits
    over its preceding-window touches with weights HALVING per
    {DECAY_HALF_US}-µs of age — the recency-weighted member of the
    attribution family (q_first_touch: winner-take-all;
    q_attribution_linear: equal; q_attribution_markov: causal removal;
    this: the industry time-decay default).

    Exactness: weights are pure integers 1024 >> (age div half-life)
    — powers of two, no float exponentials anywhere; per-(purchase,
    type) weight sums are bigints and each type's credit is ONE
    integer division value·sw_type div sw_total (the q_attribution_
    linear closing device, floors dropping identically on both
    engines). Shape: the SAME bucketed range join as q_first_touch /
    q_attribution_linear; everything after is partial-aggregated
    groupBys — the credit table is |purchases × types|.
    """
    from locopy_spark.operators.rangejoin import range_join

    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us(e, "ts")
    points = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        ts_us.alias("p_us"),
    )
    intervals = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.expr("cast(floor(value * 1000 + 0.5) as bigint)").alias(
            "value_fix"
        ),
        (ts_us - F.lit(ATTR_WINDOW_US)).alias("lo_us"),
        ts_us.alias("hi_us"),
    )
    cands = range_join(
        points,
        intervals,
        point_col="p_us",
        lo_col="lo_us",
        hi_col="hi_us",
        bucket=ATTR_WINDOW_US,
        keys=["user_id"],
    ).withColumn(
        "w",
        F.expr(
            "shiftright(1024, cast(least((hi_us - p_us)"
            f" div {DECAY_HALF_US}, 10) as int))"
        ),
    )
    # one exchange for the whole closing device (r12, guide §2.4):
    # hash-partitioning on purchase_id up front satisfies the grouped
    # aggregate's clustering (purchase_id is a prefix of the key) AND
    # the per-purchase total window, so the old total-groupBy +
    # data-sized sort-merge join back disappears (3 exchanges + SMJ →
    # 1 exchange + window; integer sums are order-independent, rows
    # identical)
    from pyspark.sql import Window as W

    per_type = (
        cands.repartition("purchase_id")
        .groupBy("purchase_id", "value_fix", "touch_type")
        .agg(F.sum("w").alias("sw"))
    )
    credited = per_type.withColumn(
        "sw_total", F.sum("sw").over(W.partitionBy("purchase_id"))
    ).select(
        "touch_type",
        "purchase_id",
        F.expr("value_fix * sw div sw_total").alias("credit_fix"),
    )
    return (
        credited.groupBy("touch_type")
        .agg(
            F.count_distinct("purchase_id").alias("n_purchases"),
            F.sum("credit_fix").alias("credit_fix"),
        )
        .withColumn(
            "credit", F.expr("cast(credit_fix as double) / 1000.0")
        )
        .orderBy("touch_type")
    )


ORACLE["q_attribution_decay"] = f"""
  WITH c AS (
    SELECT p.event_id AS purchase_id,
           CAST(FLOOR(p.value * 1000 + 0.5) AS BIGINT) AS value_fix,
           x.event_type AS touch_type,
           1024 >> CAST(LEAST((epoch_us(p.ts) - epoch_us(x.ts))
                              // {DECAY_HALF_US}, 10) AS INT) AS w
    FROM events p JOIN events x
      ON p.event_type = 'purchase'
     AND x.event_type IN ('view', 'click')
     AND x.user_id = p.user_id
     AND epoch_us(x.ts) >= epoch_us(p.ts) - {ATTR_WINDOW_US}
     AND epoch_us(x.ts) < epoch_us(p.ts)
  ),
  per_type AS (
    SELECT purchase_id, value_fix, touch_type,
           CAST(SUM(w) AS BIGINT) AS sw
    FROM c GROUP BY 1, 2, 3
  ),
  totals AS (
    SELECT purchase_id, CAST(SUM(sw) AS BIGINT) AS sw_total
    FROM per_type GROUP BY 1
  )
  SELECT pt.touch_type,
         COUNT(DISTINCT pt.purchase_id) AS n_purchases,
         CAST(SUM(pt.value_fix * pt.sw // t.sw_total) AS BIGINT)
           AS credit_fix,
         CAST(CAST(SUM(pt.value_fix * pt.sw // t.sw_total) AS BIGINT)
              AS DOUBLE) / 1000.0 AS credit
  FROM per_type pt JOIN totals t ON pt.purchase_id = t.purchase_id
  GROUP BY 1 ORDER BY 1
"""


# -- exact Shapley channel attribution ---------------------------------------------

# Ordered channel list → bit i of the per-user touch mask.  k = 4
# keeps the coalition lattice at 2⁴ = 16 rows — bounded forever.
SHAPLEY_CHANNELS = ["click", "error", "signup", "view"]
# |S|!·(k−1−|S|)! for |S| = 0..3 (k = 4): the Shapley weight scaled
# by k! = 24 so every φ stays an exact integer.
_SHAPLEY_W = {0: 6, 1: 2, 2: 2, 3: 6}
_SHAPLEY_KFACT = 24


def q_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution — the game-theoretic
    gold standard the linear/decay/Markov panels approximate: each
    channel's credit is its average marginal contribution to the
    conversion count over every ordering of the channel set, computed
    in closed form over the coalition lattice.

    Construction: per user, ONE groupBy derives the first-purchase
    time and each channel's first-touch time; the user's MASK sets
    bit i iff channel i was touched before the first purchase (all
    touches count for never-converters), conv = purchased.  The
    |2^k|-row mask grid (users, convs per mask) is the sufficient
    state — per-mask plain-sum monoids (``stream_shapley`` maintains
    it live).  v(S) = converters reachable through S = Σ convs over
    masks ⊆ S (mask|S = S) — a 16×16 bounded zeta transform;
    φ_i·k! = Σ_{{S∌i}} |S|!(k−1−|S|)!·(v(S∪i) − v(S)) closes as exact
    integer arithmetic (weights are literals), and the efficiency
    identity Σφ = v(full) − v(∅) is pytest-asserted.

    Scale shape: the ONLY data-sized work is the one per-user
    conditional aggregate (|events| scan → |users| rows → 16-row
    grid); the lattice joins are constant-sized broadcasts.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's attribution family
    (events_ext.py:q_attribution_linear / _decay / _markov).
    """
    return shapley_report(
        shapley_state(load_table(spark, sf_dir, "events")), spark
    )


def shapley_state(events: DataFrame) -> DataFrame:
    """The (mask, users, convs) coalition grid — 2^k rows forever,
    per-mask plain-sum monoids.  The per-user first-touch row is
    itself an idempotent MIN merge, so the live maintainer
    (``stream_shapley``) keys on user over ``shapley_user_state`` and
    re-grids at read time via ``shapley_grid``."""
    return shapley_grid(shapley_user_state(events))


def shapley_user_state(events: DataFrame) -> DataFrame:
    """The KEYED per-user (conv_us, t{{i}}_us) first-touch row — all
    columns idempotent MIN monoids (null = never touched; MIN ignores
    nulls, so out-of-order chunks merge exactly)."""
    per_user = events.groupBy("user_id").agg(
        F.min(
            F.expr(
                f"case when event_type = 'purchase' then {sql_epoch_us(events, 'ts')} end"
            )
        ).alias("conv_us"),
        *[
            F.min(
                F.expr(
                    f"case when event_type = '{ch}' then {sql_epoch_us(events, 'ts')} end"
                )
            ).alias(f"t{i}_us")
            for i, ch in enumerate(SHAPLEY_CHANNELS)
        ],
    )
    return per_user


def shapley_grid(per_user: DataFrame) -> DataFrame:
    """Row-local mask projection + bounded re-grid over any keyed
    per-user first-touch state."""
    mask_expr = " + ".join(
        f"(case when t{i}_us is not null"
        f" and (conv_us is null or t{i}_us < conv_us)"
        f" then {1 << i} else 0 end)"
        for i in range(len(SHAPLEY_CHANNELS))
    )
    return (
        per_user.select(
            F.expr(f"cast({mask_expr} as int)").alias("mask"),
            F.expr("cast(conv_us is not null as bigint)").alias("conv"),
        )
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).alias("users"),
            F.sum("conv").alias("convs"),
        )
    )


def shapley_report(grid: DataFrame, spark: SparkSession) -> DataFrame:
    """Close the per-channel Shapley panel over any (mask, users,
    convs) coalition grid."""
    from locopy_spark.functions.cache import managed_persist

    k = len(SHAPLEY_CHANNELS)
    n_masks = 1 << k
    # v(S): zeta transform over the bounded lattice (broadcast join).
    # v fans out to FOUR consumers (two marginal arms + two totals) —
    # persist the 2^k-row result so the data-sized per-user aggregate
    # beneath it runs ONCE, not once per consumer subtree.
    subsets = spark.range(n_masks).select(F.col("id").cast("int").alias("s"))
    # TOTAL zeta transform: LEFT JOIN from the full 2^k lattice so every
    # v(S) row exists even when no user's mask is a subset of S (e.g. no
    # mask-0 user because every converter touched a channel first) —
    # v(S)=0 then, and the marginal/total consumers below stay correct
    # on ANY grid, including degenerate mid-stream states.  An inner
    # join here silently dropped those coalitions (ADVICE r9, high).
    v = managed_persist(
        subsets.join(F.broadcast(grid), F.expr("(mask | s) = s"), "left")
        .groupBy("s")
        .agg(
            F.coalesce(F.sum("convs"), F.lit(0)).cast("bigint").alias("v")
        ),
        "shapley",
    )
    w_case = "CASE bit_count(s) " + " ".join(
        f"WHEN {sz} THEN {w}" for sz, w in _SHAPLEY_W.items()
    ) + " END"
    channels = spark.createDataFrame(
        [(ch, 1 << i) for i, ch in enumerate(SHAPLEY_CHANNELS)],
        "channel string, bit int",
    )
    marginal = (
        F.broadcast(channels)
        .crossJoin(v.select("s", "v"))
        .filter(F.expr("(s & bit) = 0"))
        .join(
            v.select(F.col("s").alias("s2"), F.col("v").alias("v2")),
            F.expr("s2 = (s | bit)"),
        )
        .groupBy("channel")
        .agg(F.sum(F.expr(f"({w_case}) * (v2 - v)")).alias("phi_x24"))
    )
    totals = (
        v.filter(F.expr(f"s = {n_masks - 1}"))
        .select(F.col("v").alias("v_full"))
        .crossJoin(
            v.filter(F.expr("s = 0")).select(F.col("v").alias("v_empty"))
        )
    )
    return (
        marginal.crossJoin(F.broadcast(totals))
        .selectExpr(
            "channel",
            "cast(phi_x24 as bigint) AS phi_x24",
            "v_full",
            "v_empty",
            "cast(cast(phi_x24 as decimal(38,0)) * 1000000"
            f" div greatest({_SHAPLEY_KFACT} * (v_full - v_empty), 1)"
            " as bigint) AS share_ppm",
        )
        .orderBy("channel")
    )


def _sql_shapley() -> str:
    k = len(SHAPLEY_CHANNELS)
    n_masks = 1 << k
    mins = ",\n           ".join(
        f"MIN(CASE WHEN event_type = '{ch}' THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t{i}_us"
        for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    mask_expr = " + ".join(
        f"(CASE WHEN t{i}_us IS NOT NULL"
        f" AND (conv_us IS NULL OR t{i}_us < conv_us)"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(k)
    )
    w_case = "CASE bit_count(v.s) " + " ".join(
        f"WHEN {sz} THEN {w}" for sz, w in _SHAPLEY_W.items()
    ) + " END"
    chans = ", ".join(
        f"('{ch}', {1 << i})" for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    return f"""
  WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'purchase'
               THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS conv_us,
           {mins}
    FROM events GROUP BY 1
  ),
  grid AS (
    SELECT CAST({mask_expr} AS INT) AS mask,
           COUNT(*) AS users,
           CAST(SUM(CAST(conv_us IS NOT NULL AS BIGINT)) AS BIGINT) AS convs
    FROM per_user GROUP BY 1
  ),
  v AS (
    -- TOTAL zeta transform (matches the Spark LEFT JOIN): every v(S)
    -- row exists with v(S)=0 when no mask is a subset of S
    SELECT t.s, CAST(COALESCE(SUM(g.convs), 0) AS BIGINT) AS v
    FROM range({n_masks}) AS t(s) LEFT JOIN grid g ON (g.mask | t.s) = t.s
    GROUP BY 1
  ),
  channels AS (SELECT * FROM (VALUES {chans}) AS c(channel, bit)),
  marginal AS (
    SELECT c.channel,
           CAST(SUM(({w_case}) * (v2.v - v.v)) AS BIGINT) AS phi_x24
    FROM channels c
    JOIN v ON (v.s & c.bit) = 0
    JOIN v v2 ON v2.s = (v.s | c.bit)
    GROUP BY 1
  ),
  totals AS (
    SELECT (SELECT v FROM v WHERE s = {n_masks - 1}) AS v_full,
           (SELECT v FROM v WHERE s = 0) AS v_empty
  )
  SELECT channel, phi_x24, v_full, v_empty,
         CAST(CAST(phi_x24 AS HUGEINT) * 1000000
              // GREATEST({_SHAPLEY_KFACT} * (v_full - v_empty), 1)
              AS BIGINT) AS share_ppm
  FROM marginal, totals ORDER BY channel
"""


ORACLE["q_attribution_shapley"] = _sql_shapley()


# -- funnel stage-dropoff significance ----------------------------------------------


def q_funnel_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-tests on each funnel transition, split by the
    experiment variant (``user_id % 2`` — the q_ab_test convention):
    did the variant move view→click, and click→purchase, conversion
    significantly? — the per-STAGE significance read that q_ab_test's
    single end-to-end proportion and q_events_funnel's raw counts
    both leave open (a variant can help one transition and hurt the
    next; the end-to-end z nets them out).

    Exactness & streaming: the state is the per-user (variant,
    first-view, first-click, first-purchase) conditional-min row — an
    idempotent MIN monoid keyed by user (``stream_funnel_sig``
    maintains it live); ordered stage flags (view < click <
    purchase, the q_events_funnel ordering) collapse to ONE 1-row
    conditional count aggregate, the two transition rows fan out
    row-locally (literal struct array — no shuffle), and each z is
    the repo's pooled two-proportion formula (identical text both
    engines) over exact counts; degenerate cells yield NULL z.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's experimentation family
    (q_ab_test / q_sprt / q_events_funnel).
    """
    return funnel_sig_report(
        funnel_sig_state(load_table(spark, sf_dir, "events"))
    )


def funnel_sig_state(events: DataFrame) -> DataFrame:
    """The per-user (variant, first_view_us, first_click_us,
    first_purchase_us) conditional-min row — idempotent MIN monoids
    keyed by user."""
    t = epoch_us(events, "ts")
    return events.groupBy("user_id").agg(
        F.max(F.expr("cast(user_id % 2 as int)")).alias("variant"),
        F.min(F.when(F.col("event_type") == "view", t)).alias("v_us"),
        F.min(F.when(F.col("event_type") == "click", t)).alias("c_us"),
        F.min(F.when(F.col("event_type") == "purchase", t)).alias("p_us"),
    )


def funnel_sig_report(state: DataFrame) -> DataFrame:
    """Close the per-transition significance panel over any per-user
    conditional-min state."""
    from locopy_spark.queries.mining import _Z

    agg = state.selectExpr(
        "variant",
        "cast(v_us is not null as bigint) AS s1",
        "cast(v_us is not null and c_us is not null"
        " and v_us < c_us as bigint) AS s2",
        "cast(v_us is not null and c_us is not null and p_us is not null"
        " and v_us < c_us and c_us < p_us as bigint) AS s3",
    ).agg(
        F.sum(F.expr("case when variant = 0 then s1 else 0 end")).alias("s1_0"),
        F.sum(F.expr("case when variant = 1 then s1 else 0 end")).alias("s1_1"),
        F.sum(F.expr("case when variant = 0 then s2 else 0 end")).alias("s2_0"),
        F.sum(F.expr("case when variant = 1 then s2 else 0 end")).alias("s2_1"),
        F.sum(F.expr("case when variant = 0 then s3 else 0 end")).alias("s3_0"),
        F.sum(F.expr("case when variant = 1 then s3 else 0 end")).alias("s3_1"),
    )
    rows = agg.selectExpr(
        "explode(array("
        "struct('view->click' AS transition,"
        " s1_0 AS n0, s2_0 AS c0, s1_1 AS n1, s2_1 AS c1),"
        "struct('click->purchase' AS transition,"
        " s2_0 AS n0, s3_0 AS c0, s2_1 AS n1, s3_1 AS c1)"
        ")) AS r"
    ).selectExpr("r.*")
    z = _Z.format(n0="n0", n1="n1", c0="c0", c1="c1")
    return rows.selectExpr(
        "transition", "n0", "c0", "n1", "c1",
        "CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0"
        f" OR c0 + c1 = n0 + n1 THEN NULL ELSE {z} END AS z_score",
    ).orderBy("transition")


def _sql_funnel_sig() -> str:
    from locopy_spark.queries.mining import _Z

    z = _Z.format(n0="n0", n1="n1", c0="c0", c1="c1")
    return f"""
  WITH state AS (
    SELECT user_id, MAX(user_id % 2) AS variant,
           MIN(CASE WHEN event_type = 'view'
               THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v_us,
           MIN(CASE WHEN event_type = 'click'
               THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS c_us,
           MIN(CASE WHEN event_type = 'purchase'
               THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p_us
    FROM events GROUP BY 1
  ),
  flags AS (
    SELECT variant,
           CAST(v_us IS NOT NULL AS BIGINT) AS s1,
           CAST(v_us IS NOT NULL AND c_us IS NOT NULL
                AND v_us < c_us AS BIGINT) AS s2,
           CAST(v_us IS NOT NULL AND c_us IS NOT NULL AND p_us IS NOT NULL
                AND v_us < c_us AND c_us < p_us AS BIGINT) AS s3
    FROM state
  ),
  agg AS (
    SELECT
      CAST(SUM(CASE WHEN variant = 0 THEN s1 ELSE 0 END) AS BIGINT) AS s1_0,
      CAST(SUM(CASE WHEN variant = 1 THEN s1 ELSE 0 END) AS BIGINT) AS s1_1,
      CAST(SUM(CASE WHEN variant = 0 THEN s2 ELSE 0 END) AS BIGINT) AS s2_0,
      CAST(SUM(CASE WHEN variant = 1 THEN s2 ELSE 0 END) AS BIGINT) AS s2_1,
      CAST(SUM(CASE WHEN variant = 0 THEN s3 ELSE 0 END) AS BIGINT) AS s3_0,
      CAST(SUM(CASE WHEN variant = 1 THEN s3 ELSE 0 END) AS BIGINT) AS s3_1
    FROM flags
  ),
  rows_ AS (
    SELECT UNNEST([
      {{'transition': 'view->click',
        'n0': s1_0, 'c0': s2_0, 'n1': s1_1, 'c1': s2_1}},
      {{'transition': 'click->purchase',
        'n0': s2_0, 'c0': s3_0, 'n1': s2_1, 'c1': s3_1}}
    ], recursive := true)
    FROM agg
  )
  SELECT transition, n0, c0, n1, c1,
         CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0
           OR c0 + c1 = n0 + n1 THEN NULL ELSE {z} END AS z_score
  FROM rows_ ORDER BY transition
"""


ORACLE["q_funnel_sig"] = _sql_funnel_sig()


# -- Cochran's Q marginal-homogeneity test --------------------------------------------

# chi-square(k-1 = 3) 0.95 quantile — the Q rejection bound, a shared
# literal in both engines
_CQ_CRIT_95 = "7.814727903251179"


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test across the four marketing channels on
    PRE-CONVERSION journeys: do the channels appear in users' paths
    to (first) purchase at the same rate, or do their touch rates
    differ significantly? — the k-treatment generalization of
    q_mcnemar (k = 2 reduces to it), on matched binary outcomes
    x_uj = "channel j was in user u's pre-purchase window" (all
    touches count for never-converters — exactly the
    q_attribution_shapley mask).  Q = (k−1)·(k·ΣCj² − N²)
    / (k·N − ΣRi²) ~ chi-square(k−1), with Cj the channel touch
    counts, Ri the per-user touched-channel counts, N = ΣRi.

    Exactness & streaming: SECOND read-time finisher on the keyed
    per-user first-touch state ``shapley_user_state`` (idempotent MIN
    monoid — ``stream_cochran_q`` maintains it live with the same
    merge as stream_shapley), and the 2^k coalition grid it closes
    over is LITERALLY ``shapley_grid``: Cj/Ri sums are exact bigint
    sums over its 16 rows, and Q is one shared double expression over
    exact integers.  All-or-nothing users (Ri = 0 or Ri = k)
    contribute zero to both effect and dispersion exactly as the
    textbook form implies; a degenerate state where EVERY user is
    all-or-nothing zeroes the denominator and yields NULL via an
    exact integer guard, never a divide crash.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's experiment-analysis family
    (q_mcnemar / q_friedman / q_posthoc_pairs).
    """
    return cochran_report(
        shapley_user_state(load_table(spark, sf_dir, "events"))
    )


def _cq_close_expr() -> str:
    """The shared Q closure over (k, n_touch = N, sum_r2 = ΣRi²,
    sum_c2 = ΣCj²) — identical text on both engines."""
    k = len(SHAPLEY_CHANNELS)
    num = (
        f"CAST({k - 1} AS DOUBLE) * ({k}.0 * CAST(sum_c2 AS DOUBLE)"
        " - CAST(n_touch AS DOUBLE) * CAST(n_touch AS DOUBLE))"
    )
    den = f"({k}.0 * CAST(n_touch AS DOUBLE) - CAST(sum_r2 AS DOUBLE))"
    guard = f"{k} * n_touch > sum_r2"
    return (
        f"CASE WHEN {guard} THEN ({num}) / ({den}) END"
    )


def cochran_report(per_user: DataFrame) -> DataFrame:
    """Close Cochran's Q over any keyed per-user first-touch state —
    via the SAME 2^k pre-conversion coalition grid the Shapley panel
    closes over (``shapley_grid``)."""
    k = len(SHAPLEY_CHANNELS)
    grid = shapley_grid(per_user)
    c_sums = [
        F.sum(
            F.expr(f"case when (mask & {1 << j}) > 0 then users"
                   " else 0 end")
        ).alias(f"c{j}")
        for j in range(k)
    ]
    agg = grid.agg(
        F.sum("users").alias("n_users"),
        F.expr("CAST(SUM(users * bit_count(mask)) AS BIGINT)").alias(
            "n_touch"
        ),
        F.expr(
            "CAST(SUM(users * bit_count(mask) * bit_count(mask))"
            " AS BIGINT)"
        ).alias("sum_r2"),
        *c_sums,
    )
    c2 = " + ".join(f"c{j} * c{j}" for j in range(k))
    q_expr = _cq_close_expr()
    return agg.selectExpr(
        "n_users",
        *[
            f"CAST(c{j} AS BIGINT) AS n_{ch}"
            for j, ch in enumerate(SHAPLEY_CHANNELS)
        ],
        f"CAST(({c2}) AS BIGINT) AS sum_c2",
        "n_touch",
        "sum_r2",
    ).selectExpr(
        "n_users",
        *[f"n_{ch}" for ch in SHAPLEY_CHANNELS],
        f"{q_expr} AS q",
        f"CASE WHEN ({q_expr}) IS NOT NULL"
        f" THEN ({q_expr}) > {_CQ_CRIT_95} END AS reject_95",
    )


def _sql_cochran_q() -> str:
    k = len(SHAPLEY_CHANNELS)
    mins = ",\n           ".join(
        f"MIN(CASE WHEN event_type = '{ch}'"
        f" THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t{i}_us"
        for i, ch in enumerate(SHAPLEY_CHANNELS)
    )
    mask_expr = " + ".join(
        f"(CASE WHEN t{i}_us IS NOT NULL"
        f" AND (conv_us IS NULL OR t{i}_us < conv_us)"
        f" THEN {1 << i} ELSE 0 END)"
        for i in range(k)
    )
    cs = ",\n           ".join(
        f"CAST(SUM(CASE WHEN (mask & {1 << j}) > 0 THEN users"
        f" ELSE 0 END) AS BIGINT) AS c{j}"
        for j in range(k)
    )
    c2 = " + ".join(f"c{j} * c{j}" for j in range(k))
    q_expr = _cq_close_expr()
    names = ", ".join(
        f"c{j} AS n_{ch}" for j, ch in enumerate(SHAPLEY_CHANNELS)
    )
    return f"""
  WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'purchase'
               THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS conv_us,
           {mins}
    FROM events GROUP BY 1
  ),
  grid AS (
    SELECT CAST({mask_expr} AS INT) AS mask, COUNT(*) AS users
    FROM per_user GROUP BY 1
  ),
  agg AS (
    SELECT CAST(SUM(users) AS BIGINT) AS n_users,
           CAST(SUM(users * bit_count(CAST(mask AS BIT)))
                AS BIGINT) AS n_touch,
           CAST(SUM(users * bit_count(CAST(mask AS BIT))
                    * bit_count(CAST(mask AS BIT))) AS BIGINT) AS sum_r2,
           {cs}
    FROM grid
  ),
  named AS (
    SELECT n_users, {names},
           CAST(({c2}) AS BIGINT) AS sum_c2, n_touch, sum_r2
    FROM agg
  )
  SELECT n_users, {", ".join(f"n_{ch}" for ch in SHAPLEY_CHANNELS)},
         {q_expr} AS q,
         CASE WHEN ({q_expr}) IS NOT NULL
              THEN ({q_expr}) > {_CQ_CRIT_95} END AS reject_95
  FROM named
"""


ORACLE["q_cochran_q"] = _sql_cochran_q()
