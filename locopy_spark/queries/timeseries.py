"""Time-series / hypertable queries over the events stream: OHLC
downsampling, gap-filled forward-filled resampling, and one-scan
multi-granularity rollups.

The reference (capitalone/locopy) is a warehouse loader client with no
query engine of its own (reference: locopy/database.py, redshift.py);
this family covers what its users run ON the warehouse after loading
event data — downsample / resample / continuous-aggregate shapes, here
expressed Spark-first.

Determinism: every time bucket is pure integer epoch math over
``epoch_us`` (session-TZ independent, NTZ-safe), selections (open /
close) are ordered by the unique ``(ts_us, event_id)`` key, and sums
go through the fixed-point ``exact_sum`` scheme — so results are
bit-identical at any parallelism and across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from locopy_spark.functions.numeric import SCALE, sql_epoch_day, sql_epoch_us
from locopy_spark.sources.tables import load_table

US_PER_HOUR = 3_600_000_000
US_PER_DAY = 86_400_000_000


def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars of ``value`` per event type.

    One shuffle: a single groupBy with partial aggregation — open and
    close are ``min_by`` / ``max_by`` over the unique ``(ts_us,
    event_id)`` struct ordering, so the map-side combiner keeps exactly
    one candidate row per (hour, type) per partition and the reducer
    merges candidates, never row lists. At 100 TB this is the shape
    that works: no per-group sort, no window, state per group is O(1).
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = sql_epoch_us(e, "ts")
    return (
        e.select(
            F.expr(f"({ts_us}) div {US_PER_HOUR} * 3600").alias("hour_ts"),
            "event_type",
            "value",
            F.expr(f"struct(({ts_us}) as ts_us, event_id)").alias("okey"),
        )
        .groupBy("hour_ts", "event_type")
        .agg(
            F.expr("min_by(value, okey)").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.expr("max_by(value, okey)").alias("close_v"),
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                f"CAST(SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT))"
                f" AS DOUBLE) / {SCALE}.0"
            ).alias("sum_value"),
        )
        .orderBy("hour_ts", "event_type")
    )


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly resample per event type with forward fill.

    Missing hours appear with ``n_events = 0`` and the last observed
    hourly mean carried forward (the time-series ``locf`` resample).
    Spine = ``sequence(min_hour, max_hour)`` exploded per series key
    (spine size is time-range / granularity per key — bounded and tiny
    relative to the data); fill = ``last(ignorenulls)`` over an
    unbounded-preceding window partitioned by the series key, so each
    series fills independently and in parallel. At 100 TB the window
    partition is (type, ~720 hours/month) rows, never the raw events.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = sql_epoch_us(e, "ts")
    hourly = (
        e.select(
            "event_type",
            F.expr(f"({ts_us}) div {US_PER_HOUR}").alias("h"),
            "value",
        )
        .groupBy("event_type", "h")
        .agg(
            F.count(F.lit(1)).alias("obs_n"),
            F.sum(
                F.expr(f"CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT)")
            ).alias("sum_fp"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
        .select(
            "event_type", F.explode(F.expr("sequence(mn, mx)")).alias("h")
        )
    )
    joined = spine.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("obs_n", F.lit(0)).alias("n_events"),
        F.expr(
            f"CAST(sum_fp AS DOUBLE) / {SCALE}.0 / obs_n"
        ).alias("mean_obs"),
    )
    w = W.partitionBy("event_type").orderBy("h")
    return (
        joined.select(
            "event_type",
            (F.col("h") * 3600).alias("hour_ts"),
            "n_events",
            F.last("mean_obs", ignorenulls=True).over(w).alias("mean_value"),
            (F.col("n_events") > 0).alias("is_observed"),
        )
        .orderBy("event_type", "hour_ts")
    )


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan multi-granularity rollup (hypertable continuous
    aggregate): hourly, daily, and per-type totals from one GROUPING
    SETS pass — Catalyst expands the sets into a single shuffle, so
    maintaining three granularities costs one scan, not three.

    The bucket hierarchy is aligned (hour ⊂ day), so at 100 TB the
    coarser sets are cheap re-aggregations of the finest partial
    aggregates; ``g_hour``/``g_day`` grouping flags disambiguate the
    granularity of each output row.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = sql_epoch_us(e, "ts")
    e.select(
        "event_type",
        F.expr(f"({ts_us}) div {US_PER_DAY}").alias("day_id"),
        F.expr(f"({ts_us}) div {US_PER_HOUR} * 3600").alias("hour_ts"),
        "value",
    ).createOrReplaceTempView("_ht_events")
    return spark.sql(
        f"""
        SELECT event_type, day_id, hour_ts,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT))
                    AS DOUBLE) / {SCALE}.0 AS sum_value,
               CAST(GROUPING(day_id) AS INT) AS g_day,
               CAST(GROUPING(hour_ts) AS INT) AS g_hour
        FROM _ht_events
        GROUP BY GROUPING SETS (
          (event_type, day_id, hour_ts),
          (event_type, day_id),
          (event_type)
        )
        ORDER BY g_day, g_hour, event_type, day_id, hour_ts
        """
    )


ORACLE: dict[str, str] = {
    "q_resample_ohlc": f"""
      WITH b AS (
        SELECT epoch_us(ts) // {US_PER_HOUR} * 3600 AS hour_ts,
               event_type, value,
               ROW_NUMBER() OVER (
                 PARTITION BY epoch_us(ts) // {US_PER_HOUR}, event_type
                 ORDER BY epoch_us(ts), event_id) AS rn_a,
               ROW_NUMBER() OVER (
                 PARTITION BY epoch_us(ts) // {US_PER_HOUR}, event_type
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn_d
        FROM events
      )
      SELECT hour_ts, event_type,
             MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
             MAX(value) AS high_v,
             MIN(value) AS low_v,
             MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT))
                  AS DOUBLE) / {SCALE}.0 AS sum_value
      FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_gap_fill": f"""
      WITH h AS (
        SELECT event_type, epoch_us(ts) // {US_PER_HOUR} AS h,
               COUNT(*) AS obs_n,
               SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT)) AS sum_fp
        FROM events GROUP BY 1, 2
      ),
      bounds AS (
        SELECT event_type, MIN(h) AS mn, MAX(h) AS mx FROM h GROUP BY 1
      ),
      spine AS (
        SELECT event_type, UNNEST(generate_series(mn, mx)) AS h FROM bounds
      ),
      j AS (
        SELECT s.event_type, s.h,
               COALESCE(h.obs_n, 0) AS n_events,
               CAST(h.sum_fp AS DOUBLE) / {SCALE}.0 / h.obs_n AS mean_obs
        FROM spine s LEFT JOIN h ON s.event_type = h.event_type
                                AND s.h = h.h
      )
      SELECT event_type, h * 3600 AS hour_ts, n_events,
             LAST_VALUE(mean_obs IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h) AS mean_value,
             n_events > 0 AS is_observed
      FROM j ORDER BY event_type, hour_ts
    """,
    "q_hypertable_rollup": f"""
      WITH b AS (
        SELECT event_type,
               epoch_us(ts) // {US_PER_DAY} AS day_id,
               epoch_us(ts) // {US_PER_HOUR} * 3600 AS hour_ts,
               value
        FROM events
      )
      SELECT event_type, day_id, hour_ts,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT))
                  AS DOUBLE) / {SCALE}.0 AS sum_value,
             CAST(GROUPING(day_id) AS INT) AS g_day,
             CAST(GROUPING(hour_ts) AS INT) AS g_hour
      FROM b
      GROUP BY GROUPING SETS (
        (event_type, day_id, hour_ts),
        (event_type, day_id),
        (event_type)
      )
      ORDER BY g_day, g_hour, event_type, day_id, hour_ts
    """,
}


TRAIL_DAYS = 7


def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + trailing-7-day distinct active users per day (DAU/WAU).

    Sliding COUNT DISTINCT is the canonical hard-at-scale window: a
    literal per-day distinct-over-trailing-range recomputes every day's
    set 7 times. Instead: reduce to the distinct (day, user) grid
    first (one shuffle, grid-sized), then each grid row CONTRIBUTES to
    its 7 covering target days (bounded x7 row-local explode), dedupe,
    count. Work scales with |grid| x window/granularity, independent
    of raw event volume; no window function at all. The ramp days
    before the data's start are clipped to the observed day range.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = sql_epoch_us(e, "ts")
    grid = (
        e.select(
            F.expr(f"({ts_us}) div {US_PER_DAY}").alias("day"), "user_id"
        )
        .distinct()
    )
    bounds = grid.agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    contrib = (
        grid.select(
            "user_id",
            F.explode(
                F.expr(f"sequence(day, day + {TRAIL_DAYS - 1})")
            ).alias("t_day"),
        )
        .join(F.broadcast(bounds))
        .filter((F.col("t_day") >= F.col("mn")) & (F.col("t_day") <= F.col("mx")))
        .select("t_day", "user_id")
        .distinct()
    )
    wau = contrib.groupBy("t_day").agg(
        F.count(F.lit(1)).alias("n_active_7d")
    )
    dau = grid.groupBy(F.col("day").alias("t_day")).agg(
        F.count(F.lit(1)).alias("n_active_1d")
    )
    # full in-range day spine: a day with zero same-day actives must
    # still appear (n_active_1d = 0), not silently vanish from the
    # series — inner-joining the observed days would drop it
    spine = bounds.select(
        F.explode(F.expr("sequence(mn, mx)")).alias("t_day")
    )
    return (
        spine.join(dau, "t_day", "left")
        .join(wau, "t_day", "left")
        .select(
            (F.col("t_day") * 86400).alias("day_ts"),
            F.coalesce("n_active_1d", F.lit(0)).alias("n_active_1d"),
            F.coalesce("n_active_7d", F.lit(0)).alias("n_active_7d"),
        )
        .orderBy("day_ts")
    )


ORACLE["q_active_users"] = f"""
  WITH grid AS (
    SELECT DISTINCT epoch_us(ts) // {US_PER_DAY} AS day, user_id
    FROM events
  ),
  b AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM grid),
  contrib AS (
    SELECT DISTINCT g.user_id,
           g.day + UNNEST(generate_series(0, {TRAIL_DAYS - 1})) AS t_day
    FROM grid g
  ),
  wau AS (
    SELECT c.t_day, COUNT(*) AS n_active_7d
    FROM contrib c, b
    WHERE c.t_day >= b.mn AND c.t_day <= b.mx
    GROUP BY c.t_day
  ),
  dau AS (
    SELECT day AS t_day, COUNT(*) AS n_active_1d FROM grid GROUP BY day
  )
  ,
  spine AS (
    SELECT UNNEST(generate_series(mn, mx)) AS t_day FROM b
  )
  SELECT s.t_day * 86400 AS day_ts,
         COALESCE(d.n_active_1d, 0) AS n_active_1d,
         COALESCE(w.n_active_7d, 0) AS n_active_7d
  FROM spine s
  LEFT JOIN dau d ON s.t_day = d.t_day
  LEFT JOIN wau w ON s.t_day = w.t_day
  ORDER BY day_ts
"""


def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (gaps-and-
    islands): reduce to the distinct (user, day) grid, then
    ``day - row_number`` is constant within each consecutive run — a
    groupBy on that constant measures every streak without self-joins
    or recursion. Output: per-user longest streak + streak count,
    restricted to users with >= 2 streak days.

    The row_number window partitions by user (bounded small: days per
    user <= calendar days), never over raw events; both shuffles are
    grid-sized.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = sql_epoch_us(e, "ts")
    grid = (
        e.select(
            "user_id", F.expr(f"({ts_us}) div {US_PER_DAY}").alias("day")
        )
        .distinct()
    )
    w = W.partitionBy("user_id").orderBy("day")
    streaks = (
        grid.withColumn("grp", F.col("day") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.max("len").alias("longest_streak"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.sum("len").alias("active_days"),
        )
        .filter(F.col("active_days") >= 2)
        .orderBy("user_id")
    )


ORACLE["q_user_streaks"] = f"""
  WITH grid AS (
    SELECT DISTINCT user_id, epoch_us(ts) // {US_PER_DAY} AS day
    FROM events
  ),
  s AS (
    SELECT user_id,
           day - ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY day) AS grp
    FROM grid
  ),
  runs AS (
    SELECT user_id, grp, COUNT(*) AS len FROM s GROUP BY 1, 2
  )
  SELECT user_id,
         CAST(MAX(len) AS BIGINT) AS longest_streak,
         COUNT(*) AS n_streaks,
         CAST(SUM(len) AS BIGINT) AS active_days
  FROM runs GROUP BY user_id
  HAVING CAST(SUM(len) AS BIGINT) >= 2
  ORDER BY user_id
"""


def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per event type (TWAP): the
    integral of the last-observation step function divided by the
    covered duration — the correct mean for IRREGULARLY sampled
    series, where the plain AVG over-weights bursts.

    Each observation carries its value for the interval until the
    next one (lead window on the type key); the integral is an exact
    bigint sum of value_fix x gap_us, divided once at the end. One
    window shuffle on the series key + one aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = sql_epoch_us(e, "ts")
    w = W.partitionBy("event_type").orderBy("ts_us", "event_id")
    stepped = (
        e.select(
            "event_type",
            "event_id",
            F.expr(f"({ts_us})").alias("ts_us"),
            F.expr(
                f"cast(floor(value * {SCALE} + 0.5) as bigint)"
            ).alias("v_fix"),
        )
        .withColumn("next_us", F.lead("ts_us").over(w))
        .filter(F.col("next_us").isNotNull())
    )
    return (
        stepped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(
                F.expr("cast(v_fix as decimal(38,0)) * (next_us - ts_us)")
            ).alias("integral_fix"),
            F.sum(F.expr("next_us - ts_us")).alias("span_us"),
        )
        .select(
            "event_type",
            "n_intervals",
            F.expr(
                # all observations at one instant (zero total span —
                # possible mid-stream): NULL, not an ANSI divide crash
                "CASE WHEN span_us = 0 THEN CAST(NULL AS DOUBLE) ELSE"
                f" CAST(integral_fix AS DOUBLE) / span_us / {SCALE}.0 END"
            ).alias("twap"),
        )
        .orderBy("event_type")
    )


def q_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score per user: each event
    contributes ``value / 2^age_days`` (half-life = 1 day, measured
    from the corpus's max timestamp).

    Unlike exp()-based decay (libm-dependent, engine-divergent),
    powers of two are EXACT in IEEE doubles and age_days is a bounded
    integer — so the per-row weight is bit-identical everywhere and
    the sum runs over exact scaled integers: value_fix x 2^(max_age -
    age) sums in DECIMAL(38), one final division by 2^max_age. Top-20
    users by score, deterministic id tiebreak.

    Range constraint: the integer weights hold while the corpus time
    span stays under ~90 half-lives (2^90 < 10^38); beyond that,
    clamp ages at ~50 half-lives first — contributions past 50
    doublings are below one ulp of any realistic sum anyway.
    """
    e = load_table(spark, sf_dir, "events")
    ts_us = sql_epoch_us(e, "ts")
    base = e.select(
        "user_id",
        F.expr(f"({ts_us}) div {US_PER_DAY}").alias("day"),
        F.expr(f"cast(floor(value * {SCALE} + 0.5) as bigint)").alias(
            "v_fix"
        ),
    )
    bounds = base.agg(
        F.max("day").alias("mx"), F.min("day").alias("mn")
    )
    scored = base.join(F.broadcast(bounds)).select(
        "user_id",
        F.expr(
            "cast(v_fix as decimal(38,0))"
            " * cast(pow(2, (mx - mn) - (mx - day)) as decimal(38,0))"
        ).alias("w_fix"),
        (F.col("mx") - F.col("mn")).alias("max_age"),
    )
    return (
        scored.groupBy("user_id", "max_age")
        .agg(F.sum("w_fix").alias("s_fix"), F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.expr(
                f"CAST(s_fix AS DOUBLE) / pow(2, max_age) / {SCALE}.0"
            ).alias("decay_score"),
        )
        .orderBy(F.desc("decay_score"), "user_id")
        .limit(20)
    )


ORACLE["q_time_weighted_avg"] = f"""
  WITH s AS (
    SELECT event_type, event_id, epoch_us(ts) AS ts_us,
           CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT) AS v_fix,
           LEAD(epoch_us(ts)) OVER (
             PARTITION BY event_type ORDER BY epoch_us(ts), event_id
           ) AS next_us
    FROM events
  )
  SELECT event_type, COUNT(*) AS n_intervals,
         CAST(SUM(CAST(v_fix AS HUGEINT) * (next_us - ts_us)) AS DOUBLE)
           / NULLIF(CAST(SUM(next_us - ts_us) AS BIGINT), 0) / {SCALE}.0 AS twap
  FROM s WHERE next_us IS NOT NULL
  GROUP BY event_type ORDER BY event_type
"""

ORACLE["q_decay_score"] = f"""
  WITH b AS (
    SELECT user_id, epoch_us(ts) // {US_PER_DAY} AS day,
           CAST(FLOOR(value * {SCALE} + 0.5) AS BIGINT) AS v_fix
    FROM events
  ),
  bd AS (SELECT MAX(day) AS mx, MIN(day) AS mn FROM b),
  s AS (
    SELECT b.user_id,
           CAST(b.v_fix AS HUGEINT)
             * CAST(POW(2, (bd.mx - bd.mn) - (bd.mx - b.day)) AS HUGEINT)
             AS w_fix,
           bd.mx - bd.mn AS max_age
    FROM b, bd
  )
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(w_fix) AS DOUBLE) / POW(2, max_age) / {SCALE}.0
           AS decay_score
  FROM s GROUP BY user_id, max_age
  ORDER BY decay_score DESC, user_id LIMIT 20
"""


# -- inter-event burstiness histogram -----------------------------------------

BURSTINESS_BAND_PPM = 500_000  # half a CV² unit per band
BURSTINESS_BANDS = 10


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event burstiness, reported as a bounded
    10-band histogram of the squared coefficient of variation of
    inter-arrival gaps: CV² ≈ 0 for metronome-regular users, ~1 for
    memoryless (Poisson) arrivals, > 1 for bursty sessions-then-
    silence behaviour — the traffic-shape read capacity planning and
    bot screening start from, scale-free so users of any activity
    level land on one axis.

    Exactness: gaps are non-negative integer SECONDS (µs div 1e6 —
    truncation agrees across engines on non-negative operands); the
    population-variance numerator m·Σx² − (Σx)² and the denominator
    (Σx)² widen through DECIMAL(38)/HUGEINT BEFORE multiplication
    (a year-long gap squared already nears the bigint edge at corpus
    time spans), and CV²·1e6 closes as one non-negative floor
    division (the numerator is ≥ 0 by Cauchy–Schwarz).  All-zero-gap
    users (every event in the same second) define CV² = 0.

    Shape: one per-user shuffle for the lag window (the
    q_event_transitions regime — per-user sequences are bounded),
    one user-level aggregate with map-side partial combine, one
    ≤ 10-row histogram.  Ties in ``ts`` are ordered by ``event_id``
    so same-µs gaps cannot flip across engines or partitionings.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.expr(sql_epoch_us(e, "ts"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        e.select("user_id", "event_id", us.alias("us"))
        .withColumn("prev_us", F.lag("us").over(w))
        .filter(F.col("prev_us").isNotNull())
        .select(
            "user_id",
            F.expr("(us - prev_us) div 1000000").alias("gap_s"),
        )
    )
    per_user = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("gap_s").alias("sx"),
        F.sum(
            F.expr("CAST(gap_s AS DECIMAL(38,0)) * gap_s")
        ).alias("sxx"),
    )
    cv2 = (
        "CASE WHEN sx = 0 THEN 0 ELSE"
        " CAST((CAST(m AS DECIMAL(38,0)) * sxx"
        "       - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000"
        " div (CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT) END"
    )
    return (
        per_user.filter(F.col("m") >= 2)
        .select(
            F.expr(
                f"CAST(LEAST({BURSTINESS_BANDS - 1},"
                f" ({cv2}) div {BURSTINESS_BAND_PPM}) AS BIGINT)"
            ).alias("band")
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("band")
    )


ORACLE["q_burstiness"] = f"""
  WITH g AS (
    SELECT user_id,
           (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
              PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           )) // 1000000 AS gap_s
    FROM events
  ),
  u AS (
    SELECT user_id, COUNT(*) AS m,
           CAST(SUM(gap_s) AS BIGINT) AS sx,
           SUM(CAST(gap_s AS HUGEINT) * gap_s) AS sxx
    FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
  ),
  c AS (
    SELECT CASE WHEN sx = 0 THEN 0 ELSE
             CAST((CAST(m AS HUGEINT) * sxx
                   - CAST(sx AS HUGEINT) * sx) * 1000000
                  // (CAST(sx AS HUGEINT) * sx) AS BIGINT) END AS cv2_ppm
    FROM u WHERE m >= 2
  )
  SELECT CAST(LEAST({BURSTINESS_BANDS - 1},
              cv2_ppm // {BURSTINESS_BAND_PPM}) AS BIGINT) AS band,
         COUNT(*) AS n_users
  FROM c GROUP BY 1 ORDER BY band
"""


# -- day-of-week × hour workload heatmap --------------------------------------


def heat_cells(events: DataFrame) -> DataFrame:
    """The additive |7 × 24| cell state — per-batch counts merge by
    (dow, hour) (commutative monoid), so a streaming maintainer
    (``streaming.stateful.stream_heatmap``) equals the batch pass on
    any arrival order.

    Bucketing is pure integer epoch math, engine-identical for ANY
    timestamp sign: both Spark ``%`` and DuckDB ``%`` follow the
    dividend's sign, so the ``((x % m) + m) % m`` guard yields the
    true non-negative residue on both engines — day-of-week via
    ``(epoch_day + 3) mod 7`` (day 0 = 1970-01-01 = Thursday = 3
    under 0 = Monday) and hour-of-day via the guarded µs residue.
    """
    us_sql = sql_epoch_us(events, "ts")
    dow = (
        f"(((((({us_sql}) div {US_PER_DAY})"
        f" - (case when (({us_sql}) % {US_PER_DAY}) < 0 then 1 else 0 end))"
        f" % 7) + 10) % 7)"
    )
    hour = (
        f"((((({us_sql}) % {US_PER_DAY}) + {US_PER_DAY}) % {US_PER_DAY})"
        f" div {US_PER_HOUR})"
    )
    return (
        events.select(
            F.expr(f"cast({dow} as bigint)").alias("dow"),
            F.expr(f"cast({hour} as bigint)").alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def heat_report(cells: DataFrame) -> DataFrame:
    """Close the heatmap over the bounded cell state: restore zero
    cells via the literal 7×24 grid (a silent hour IS signal — the
    mix_report device), then exact ppm shares off the 1-row
    broadcast total."""
    spark = cells.sparkSession
    grid = spark.range(7).select(
        F.col("id").alias("dow")
    ).crossJoin(
        spark.range(24).select(F.col("id").alias("hour"))
    )
    tot = cells.agg(F.sum("c").alias("total"))
    return (
        grid.join(cells, ["dow", "hour"], "left")
        .select(
            "dow",
            "hour",
            F.coalesce("c", F.lit(0)).cast("long").alias("n_events"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            "n_events",
            F.expr(
                "CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000"
                " div total AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("dow", "hour")
    )


def q_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day event-count heatmap with exact ppm
    shares — the workload-shape read behind capacity planning,
    maintenance-window picking, and bot screening (human traffic has
    a diurnal/weekly shape; a flat heatmap is automation evidence).
    All 168 cells are present (zero-filled via the literal grid —
    a silent cell is signal).

    Shape: ONE partial-aggregated scan to the |7 × 24| bounded cell
    state (metadata-sized shuffle), the grid and the 1-row total
    ride broadcasts, everything downstream is constant-sized.  Split
    as heat_cells state + heat_report finisher for stream_heatmap.
    """
    e = load_table(spark, sf_dir, "events")
    return heat_report(heat_cells(e))


ORACLE["q_calendar_heatmap"] = f"""
  WITH cells AS (
    SELECT (((((epoch_us(ts) // {US_PER_DAY}) % 7) + 10) % 7)) AS dow,
           ((((epoch_us(ts) % {US_PER_DAY}) + {US_PER_DAY})
             % {US_PER_DAY}) // {US_PER_HOUR}) AS hour,
           COUNT(*) AS c
    FROM events GROUP BY 1, 2
  ),
  grid AS (
    SELECT d.range AS dow, h.range AS hour
    FROM range(7) d, range(24) h
  ),
  tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM cells)
  SELECT CAST(grid.dow AS BIGINT) AS dow,
         CAST(grid.hour AS BIGINT) AS hour,
         CAST(COALESCE(cells.c, 0) AS BIGINT) AS n_events,
         CAST(CAST(COALESCE(cells.c, 0) AS HUGEINT) * 1000000
              // tot.total AS BIGINT) AS share_ppm
  FROM grid LEFT JOIN cells USING (dow, hour), tot
  ORDER BY dow, hour
"""


# -- user dormancy (recency) histogram -----------------------------------------


def dormancy_state(events: DataFrame) -> DataFrame:
    """The per-user recency state ``(user_id, last_day)`` — a MAX
    monoid (merge = max per key), so a streaming maintainer
    (``streaming.stateful.stream_dormancy``) reproduces the batch
    state on any arrival order; state is |users| rows forever.  Day
    is the floored epoch day (sql_epoch_day — engine-identical for
    any timestamp sign)."""
    day = sql_epoch_day(events, "ts")
    return (
        events.select(
            "user_id", F.expr(f"cast({day} as bigint)").alias("day")
        )
        .groupBy("user_id")
        .agg(F.max("day").alias("last_day"))
    )


def dormancy_report(state: DataFrame) -> DataFrame:
    """Close the dormancy histogram over the recency state: days
    since last activity, measured against the corpus horizon (the
    max over the state — consistent with the batch pass because max
    of per-user maxes IS the global max).  Day granularity is
    deliberate: this events corpus is dense (measured — a weekly
    bucket collapses to one row), and days are the unit an ops
    dashboard alerts on.  Output is bounded by the corpus span in
    days; the 1-row horizon rides a broadcast."""
    horizon = state.agg(F.max("last_day").alias("h"))
    return (
        state.crossJoin(F.broadcast(horizon))
        .select(F.expr("h - last_day").alias("days_inactive"))
        .groupBy("days_inactive")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("days_inactive")
    )


def q_dormancy_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user dormancy histogram — how many users last acted 0, 1,
    2, … days before the data horizon: the churn-RISK read an
    operations dashboard refreshes continuously (q_kaplan_meier is
    the retrospective survival estimate over order lifetimes; this is
    the live "how stale is the user base right now" distribution).

    Shape: ONE partial-aggregated scan to the |users| recency state
    (a MAX monoid — stream_dormancy maintains it live), a 1-row
    broadcast horizon, a span-bounded histogram.  All integer: the
    floored epoch day device, a non-negative day difference.
    """
    e = load_table(spark, sf_dir, "events")
    return dormancy_report(dormancy_state(e))


ORACLE["q_dormancy_curve"] = f"""
  WITH s AS (
    SELECT user_id,
           MAX(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)))
             AS last_day
    FROM events GROUP BY user_id
  ),
  h AS (SELECT MAX(last_day) AS h FROM s)
  SELECT CAST(h.h - s.last_day AS BIGINT) AS days_inactive,
         COUNT(*) AS n_users
  FROM s, h GROUP BY 1 ORDER BY days_inactive
"""


# -- local-prominence revenue peaks -------------------------------------------

PEAK_PROM_PCT = 120  # a peak must top both neighbors by >= 20%


def q_peak_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-prominence revenue peaks: days whose revenue tops BOTH
    neighboring observed days by ≥ {PEAK_PROM_PCT}% — the
    spike-localization read next to q_anomaly_days (whose trailing
    z-score flags sustained shifts too; this isolates sharp one-day
    spikes a promo/incident review wants listed, with the exact
    neighbor ratios attached).

    Exactness: daily revenue is exact scaled cents from ONE partial-
    aggregated scan; neighbor comparison is pure integer
    cross-multiplication (rev·100 > {PEAK_PROM_PCT}·neighbor — no
    division at all); edge days (missing a neighbor) are excluded by
    the NULL conjunction on both engines. The lag/lead window runs
    over the |calendar days|-bounded daily aggregate (the
    q_anomaly_days convention), never over raw orders. Ratios are
    reported as exact ppm floor divisions.

    Split as state + finisher since r8 so ``streaming.stateful.
    stream_peaks`` maintains the same (day, rev_c) additive monoid
    continuously; the peak scan closes over the state on demand."""
    return peaks_report(peaks_state(load_table(spark, sf_dir, "orders")))


def peaks_state(orders: DataFrame) -> DataFrame:
    """The additive daily-revenue state ``(day, rev_c)``: exact scaled
    cents per epoch day — a commutative monoid (late/re-ordered order
    rows simply add into their day), shared by ``q_peak_days`` and
    ``stream_peaks``. Prominence comparison happens only in the
    finisher because a day's peak-ness depends on NEIGHBOR days that
    later batches can still move."""
    return orders.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(
            F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
        ).alias("rev_c")
    )


def peaks_report(state: DataFrame) -> DataFrame:
    """Close the local-prominence peak scan over any (day, rev_c)
    daily-revenue state (|calendar days|-bounded)."""
    w = W.orderBy("day")
    scored = state.select(
        "day",
        "rev_c",
        F.lag("rev_c").over(w).alias("prev_c"),
        F.lead("rev_c").over(w).alias("next_c"),
    )
    return (
        scored.filter(
            F.expr(
                f"rev_c * 100 > {PEAK_PROM_PCT} * prev_c"
                f" AND rev_c * 100 > {PEAK_PROM_PCT} * next_c"
            )
        )
        .selectExpr(
            "day",
            f"CAST(rev_c AS DOUBLE) / {SCALE}.0 AS revenue",
            "rev_c * 1000000 div prev_c AS vs_prev_ppm",
            "rev_c * 1000000 div next_c AS vs_next_ppm",
        )
        .orderBy("day")
    )


ORACLE["q_peak_days"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
  ),
  scored AS (
    SELECT day, rev_c,
           LAG(rev_c) OVER (ORDER BY day) AS prev_c,
           LEAD(rev_c) OVER (ORDER BY day) AS next_c
    FROM daily
  )
  SELECT CAST(day AS BIGINT) AS day,
         CAST(rev_c AS DOUBLE) / {SCALE}.0 AS revenue,
         CAST(rev_c * 1000000 // prev_c AS BIGINT) AS vs_prev_ppm,
         CAST(rev_c * 1000000 // next_c AS BIGINT) AS vs_next_ppm
  FROM scored
  WHERE rev_c * 100 > {PEAK_PROM_PCT} * prev_c
    AND rev_c * 100 > {PEAK_PROM_PCT} * next_c
  ORDER BY day
"""


# -- running-peak drawdown -------------------------------------------------------

DRAWDOWN_BANDS = 10  # 10%-wide drawdown bands


def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Daily-revenue drawdown profile: each day's shortfall against the
    running PEAK daily revenue so far, as a 10-band histogram plus the
    maximum drawdown and the longest under-peak streak — the
    peak-to-trough read (finance drawdown applied to the revenue
    series) that q_cusum/q_anomaly_days don't give: those flag shift
    points; this quantifies how deep and how long below the best day.

    All integer: daily revenue in exact cents, the running max over
    the \|calendar days\|-bounded daily aggregate (the q_anomaly_days
    bounded-window convention), drawdown_ppm one non-negative floor
    division, bands a second. The streak is a classic gaps-and-islands
    over the bounded table (row_number difference), exact. Output is
    ONE row of summary + band columns via a bounded pivot — stable
    schema at any SF.

    Split as state + finisher since r8: the input IS the shared
    ``peaks_state`` daily-revenue monoid, so ``stream_peaks``
    maintains it continuously and this report is its third
    on-demand finisher."""
    return drawdown_report(peaks_state(load_table(spark, sf_dir, "orders")))


def drawdown_report(daily: DataFrame) -> DataFrame:
    """Close the drawdown profile over any (day, rev_c) daily-revenue
    state (|calendar days|-bounded)."""
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    dd = daily.select(
        "day",
        "rev_c",
        F.max("rev_c").over(w).alias("peak_c"),
    ).select(
        "day",
        F.expr("(peak_c - rev_c) * 1000000 div peak_c").alias("dd_ppm"),
    )
    # longest consecutive-day under-peak streak via gaps-and-islands
    under = dd.filter("dd_ppm > 0").select(
        "day", F.expr("day - row_number() over (order by day)").alias("grp")
    )
    streak = under.groupBy("grp").agg(F.count(F.lit(1)).alias("len")).agg(
        F.coalesce(F.max("len"), F.lit(0)).alias("longest_under_peak")
    )
    bands = dd.select(
        F.expr(
            f"least(dd_ppm div 100000, {DRAWDOWN_BANDS - 1})"
        ).alias("band")
    ).groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    pivot = bands.selectExpr(
        *[
            f"coalesce(max(case when band = {i} then n end), 0) as band{i}"
            for i in range(DRAWDOWN_BANDS)
        ]
    )
    summary = dd.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.max("dd_ppm").alias("max_dd_ppm"),
    )
    return summary.crossJoin(F.broadcast(streak)).crossJoin(
        F.broadcast(pivot)
    )


def _sql_drawdown() -> str:
    band_cols = ",\n         ".join(
        f"COALESCE(MAX(CASE WHEN band = {i} THEN n END), 0) AS band{i}"
        for i in range(DRAWDOWN_BANDS)
    )
    return f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
  ),
  dd AS (
    SELECT day,
           CAST((MAX(rev_c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) - rev_c) * 1000000
                // MAX(rev_c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW) AS BIGINT) AS dd_ppm
    FROM daily
  ),
  under AS (
    SELECT day, day - ROW_NUMBER() OVER (ORDER BY day) AS grp
    FROM dd WHERE dd_ppm > 0
  ),
  streak AS (
    SELECT CAST(COALESCE(MAX(len), 0) AS BIGINT) AS longest_under_peak
    FROM (SELECT COUNT(*) AS len FROM under GROUP BY grp)
  ),
  bands AS (
    SELECT LEAST(dd_ppm // 100000, {DRAWDOWN_BANDS - 1}) AS band,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dd GROUP BY 1
  ),
  bandcols AS (
    SELECT {band_cols}
    FROM bands
  ),
  summary AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(dd_ppm) AS BIGINT) AS max_dd_ppm
    FROM dd
  )
  SELECT * FROM summary, streak, bandcols
"""


ORACLE["q_drawdown"] = _sql_drawdown()


# -- DAU/MAU stickiness -----------------------------------------------------------


def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly DAU/MAU stickiness — the engagement-intensity ratio
    (what fraction of the month's actives show up on an average
    active day) product reviews track next to the raw active counts
    of q_active_users (which answers "how many"; this answers "how
    habitually").

    Exactness: everything reduces to the distinct (day, user) grid
    (the q_active_users device — one shuffle, grid-sized, independent
    of raw event volume); Σdau, observed-day counts and MAU are exact
    integers off that grid; stickiness closes as ONE ppm floor
    division Σdau·10⁶ div (n_days·mau). Scale shape: two bounded
    aggregates over the grid (|days| and |months| outputs), one
    broadcast join of the |months|-sized arms — no window, nothing
    data-sized past the grid.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's engagement/timeseries family.

    Split as state + finisher since r8: the distinct (day, user) grid
    is an idempotent SET state (union+distinct — re-delivery-safe by
    algebra, the stream_co_engagement convention), maintained live by
    ``streaming.stateful.stream_stickiness``."""
    return stickiness_report(
        stickiness_grid(load_table(spark, sf_dir, "events"))
    )


def stickiness_grid(events: DataFrame) -> DataFrame:
    """The distinct (day, user_id) activity grid — an idempotent SET
    monoid (merge is union+distinct), |users × days| rows forever."""
    day = sql_epoch_day(events, "ts")
    return events.select(F.expr(day).alias("day"), "user_id").distinct()


def stickiness_report(grid: DataFrame) -> DataFrame:
    """Close monthly DAU/MAU over the activity grid."""
    g2 = grid.select(
        "day",
        "user_id",
        F.expr(
            "year(date_add(date'1970-01-01', cast(day as int))) * 100"
            " + month(date_add(date'1970-01-01', cast(day as int)))"
        ).alias("ym"),
    )
    dau = g2.groupBy("ym", "day").agg(F.count(F.lit(1)).alias("dau"))
    mr = dau.groupBy("ym").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").alias("sum_dau"),
    )
    mau = g2.groupBy("ym").agg(F.countDistinct("user_id").alias("mau"))
    return (
        mr.join(F.broadcast(mau), "ym")
        .selectExpr(
            "cast(ym as bigint) as ym",
            "n_days",
            "sum_dau",
            "mau",
            "sum_dau * 1000000 div (n_days * mau) AS stickiness_ppm",
        )
        .orderBy("ym")
    )


ORACLE["q_stickiness"] = f"""
  WITH grid AS (
    SELECT DISTINCT epoch_us(ts) // {US_PER_DAY} AS day, user_id
    FROM events
  ),
  g2 AS (
    SELECT day, user_id,
           year(DATE '1970-01-01' + CAST(day AS INT)) * 100
             + month(DATE '1970-01-01' + CAST(day AS INT)) AS ym
    FROM grid
  ),
  dau AS (SELECT ym, day, COUNT(*) AS dau FROM g2 GROUP BY 1, 2),
  mr AS (
    SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(dau) AS BIGINT) AS sum_dau
    FROM dau GROUP BY 1
  ),
  mau AS (
    SELECT ym, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
    FROM g2 GROUP BY 1
  )
  SELECT CAST(mr.ym AS BIGINT) AS ym, n_days, sum_dau, mau,
         CAST(sum_dau * 1000000 // (n_days * mau) AS BIGINT)
           AS stickiness_ppm
  FROM mr JOIN mau ON mr.ym = mau.ym
  ORDER BY ym
"""


# -- single change-point detection --------------------------------------------------


def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single change-point of the daily revenue series: the split
    day maximizing the between-segment sum of squares (binary
    segmentation's first step — "WHEN did the level shift", the
    localization read next to q_cusum's "has it shifted" monitor).

    B(k) = (n·S_k − k·S_n)² / (k·(n−k)·n); the n in the denominator is
    constant so the argmax drops it. Exactness: S_k comes from the
    range-partitioned prefix sum over the |days|-bounded daily state
    (shared with q_peak_days / stream_peaks — ``peaks_state``);
    d = n·S_k − k·S_n is an exact bigint; the score is a per-row
    double chain over exact integers (mul/div are correctly rounded
    IEEE ops — bit-identical across engines, the q_changepoint rows
    never SUM doubles); ties break to the larger day on both engines.
    Scale shape: one partial-aggregated orders scan, two bounded
    ranking passes, a 1-row broadcast, one max_by. Nothing
    single-partition, nothing data-sized past the first scan.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's monitoring/timeseries family.
    """
    return changepoint_report(
        peaks_state(load_table(spark, sf_dir, "orders"))
    )


def changepoint_report(state: DataFrame) -> DataFrame:
    """Close the best-split scan over any (day, rev_c) daily-revenue
    state (|days|-bounded)."""
    from locopy_spark.operators.ranking import global_rank_and_running_sum

    # bounded arm (r12): the daily-revenue state is |days|-sized at
    # any volume.
    rn = global_rank_and_running_sum(
        state,
        order_cols=["day"],
        value_col="rev_c",
        rank_col="k",
        sum_col="pre",
        bounded=True,
    )
    tot = state.agg(
        F.count(F.lit(1)).alias("n"), F.sum("rev_c").alias("sn")
    )
    scored = (
        rn.crossJoin(F.broadcast(tot))
        .filter("k < n")
        .selectExpr(
            "day",
            "k",
            "n",
            "sn",
            "pre + rev_c AS s_k",
            "CAST(n AS DECIMAL(38,0)) * (pre + rev_c)"
            " - CAST(k AS DECIMAL(38,0)) * sn AS d",
        )
        .selectExpr(
            "day",
            "k",
            "n",
            "sn",
            "s_k",
            "CAST(d AS DOUBLE) * CAST(d AS DOUBLE)"
            " / CAST(k * (n - k) AS DOUBLE) AS score",
        )
    )
    best = scored.agg(
        F.expr(
            "max(struct(score, day, k, n, sn, s_k)) AS b"
        )
    )
    return best.selectExpr(
        "cast(b.day as bigint) AS split_day",
        "b.n AS n_days",
        "b.k AS n_left",
        "b.s_k AS s_left_c",
        "b.sn - b.s_k AS s_right_c",
        "b.score AS bss_score",
        f"CAST(b.s_k AS DOUBLE) / CAST(b.k * {SCALE} AS DOUBLE)"
        " AS mean_left",
        f"CAST(b.sn - b.s_k AS DOUBLE)"
        f" / CAST((b.n - b.k) * {SCALE} AS DOUBLE) AS mean_right",
    )


ORACLE["q_changepoint"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
             AS rev_c
    FROM orders GROUP BY 1
  ),
  r AS (
    SELECT day,
           ROW_NUMBER() OVER (ORDER BY day) AS k,
           SUM(rev_c) OVER (ORDER BY day) AS s_k
    FROM daily
  ),
  t AS (SELECT COUNT(*) AS n, SUM(rev_c) AS sn FROM daily),
  sc AS (
    SELECT day, k, n, sn, s_k,
           CAST(n AS HUGEINT) * s_k - CAST(k AS HUGEINT) * sn AS d
    FROM r, t WHERE k < n
  ),
  best AS (
    SELECT day, k, n, sn, s_k,
           CAST(d AS DOUBLE) * CAST(d AS DOUBLE)
             / CAST(k * (n - k) AS DOUBLE) AS score
    FROM sc ORDER BY score DESC, day DESC LIMIT 1
  )
  SELECT CAST(day AS BIGINT) AS split_day,
         CAST(n AS BIGINT) AS n_days,
         CAST(k AS BIGINT) AS n_left,
         CAST(s_k AS BIGINT) AS s_left_c,
         CAST(sn - s_k AS BIGINT) AS s_right_c,
         score AS bss_score,
         CAST(s_k AS DOUBLE) / CAST(k * {SCALE} AS DOUBLE) AS mean_left,
         CAST(sn - s_k AS DOUBLE)
           / CAST((n - k) * {SCALE} AS DOUBLE) AS mean_right
  FROM best
"""


# -- XmR (individuals/moving-range) control chart ----------------------------------


def q_xmr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XmR (individuals & moving-range) control-chart audit of daily
    revenue: which days breach the ±2.66·mR̄ natural process limits —
    Shewhart's test for "is this variation routine or a signal",
    the SPC complement of q_anomaly_days' trailing z-score (XmR
    limits come from short-run point-to-point variation, so a slow
    drift inflates z's baseline but still trips XmR).

    Exactness: the |days|-bounded daily state (the shared
    ``peaks_state`` monoid — FIFTH finisher) yields the lag-1 moving
    ranges; the breach test |x·n − S|·100·m > 266·SMR·n is pure
    integer cross-multiplication through DECIMAL(38)/HUGEINT (no
    division anywhere — 2.66 enters as the exact ratio 266/100);
    center/limits are reported as exact-operand doubles. One bounded
    lag window + two broadcast scalars.
    """
    return xmr_report(peaks_state(load_table(spark, sf_dir, "orders")))


def xmr_report(state: DataFrame) -> DataFrame:
    """Close the XmR breach scan over any (day, rev_c) daily state."""
    mr = state.select(
        "day",
        "rev_c",
        F.expr("abs(rev_c - lag(rev_c) over (order by day))").alias("mr"),
    )
    scal = mr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev_c").alias("s"),
        F.sum(F.expr("case when mr is not null then 1 end")).alias("m"),
        F.sum("mr").alias("smr"),
    )
    breaches = (
        mr.crossJoin(F.broadcast(scal))
        .filter(
            "abs(CAST(rev_c AS DECIMAL(38,0)) * n - CAST(s AS"
            " DECIMAL(38,0))) * 100 * m"
            " > CAST(266 AS DECIMAL(38,0)) * smr * n"
        )
        .selectExpr(
            "day",
            f"CAST(rev_c AS DOUBLE) / {SCALE}.0 AS revenue",
            "CAST(CASE WHEN CAST(rev_c AS DECIMAL(38,0)) * n >"
            " CAST(s AS DECIMAL(38,0)) THEN 1 ELSE -1 END AS INT)"
            " AS side",
            "CAST(s AS DOUBLE) / n / 1000.0 AS center",
            "CAST(smr AS DOUBLE) / m / 1000.0 AS avg_moving_range",
        )
        .orderBy("day")
    )
    return breaches


ORACLE["q_xmr_control"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
             AS rev_c
    FROM orders GROUP BY 1
  ),
  mr AS (
    SELECT day, rev_c,
           ABS(rev_c - LAG(rev_c) OVER (ORDER BY day)) AS mr
    FROM daily
  ),
  scal AS (
    SELECT COUNT(*) AS n, SUM(rev_c) AS s,
           COUNT(mr) AS m, SUM(mr) AS smr
    FROM mr
  )
  SELECT day,
         CAST(rev_c AS DOUBLE) / {SCALE}.0 AS revenue,
         CAST(CASE WHEN CAST(rev_c AS HUGEINT) * n > CAST(s AS HUGEINT)
              THEN 1 ELSE -1 END AS INT) AS side,
         CAST(s AS DOUBLE) / n / 1000.0 AS center,
         CAST(smr AS DOUBLE) / m / 1000.0 AS avg_moving_range
  FROM mr, scal
  WHERE ABS(CAST(rev_c AS HUGEINT) * n - CAST(s AS HUGEINT)) * 100 * m
        > CAST(266 AS HUGEINT) * smr * n
  ORDER BY day
"""


# -- Bollinger-band breach scan ------------------------------------------------------

BOLL_W = 7  # rolling window (observed days)
BOLL_K = 2  # band half-width in sigmas


def q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breach scan of daily revenue: days falling
    outside the rolling {BOLL_W}-day mean ± {BOLL_K}σ band — the
    LOCAL-volatility complement of q_xmr_control (XmR limits are
    global, from the whole series' average moving range; Bollinger
    re-estimates the band from only the trailing week, so a calm
    stretch tightens the band and a mild wobble inside it still
    signals). SIXTH finisher on the shared ``peaks_state`` daily
    monoid — ``stream_peaks`` maintains the state; the band scan
    closes on demand.

    Exactness: with S and Q the rolling sum and sum-of-squares of the
    exact cents, the breach test (x·w − S)² > k²·(w·Q − S²) is the
    squared band inequality cleared of BOTH divisions — pure integer
    cross-multiplication through DECIMAL(38)/HUGEINT, no sqrt anywhere
    (the σ² factorization: (x−μ)² > k²σ² ⇔ (xw−S)² > k²(wQ−S²)).
    z²·10⁶ is then ONE exact floor division of the same operands.
    Only full windows (w observed days) are scored; the window runs
    over the |calendar days|-bounded daily state, never raw orders.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's monitoring family.
    """
    return bollinger_report(peaks_state(load_table(spark, sf_dir, "orders")))


def bollinger_report(state: DataFrame) -> DataFrame:
    """Close the Bollinger breach scan over any (day, rev_c) daily
    state (|days|-bounded)."""
    w = W.orderBy("day").rowsBetween(-(BOLL_W - 1), 0)
    rolled = state.select(
        "day",
        "rev_c",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum("rev_c").over(w).alias("s"),
        F.sum(F.expr("CAST(rev_c AS DECIMAL(38,0)) * rev_c"))
        .over(w)
        .alias("q"),
    )
    lhs = f"CAST(rev_c AS DECIMAL(38,0)) * {BOLL_W} - CAST(s AS DECIMAL(38,0))"
    var_w2 = (
        f"CAST(q AS DECIMAL(38,0)) * {BOLL_W} "
        "- CAST(s AS DECIMAL(38,0)) * s"
    )
    return (
        rolled.filter(f"cnt = {BOLL_W}")
        .filter(f"({lhs}) * ({lhs}) > {BOLL_K * BOLL_K} * ({var_w2})")
        .selectExpr(
            "day",
            f"CAST(rev_c AS DOUBLE) / {SCALE}.0 AS revenue",
            f"CAST(CASE WHEN CAST(rev_c AS DECIMAL(38,0)) * {BOLL_W}"
            " > CAST(s AS DECIMAL(38,0)) THEN 1 ELSE -1 END AS INT)"
            " AS side",
            f"CAST(({lhs}) * ({lhs}) * 1000000"
            f" div greatest({var_w2}, 1) AS BIGINT) AS z2_ppm",
            f"CAST(s AS DOUBLE) / {BOLL_W} / {SCALE}.0 AS roll_mean",
        )
        .orderBy("day")
    )


ORACLE["q_bollinger"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
             AS rev_c
    FROM orders GROUP BY 1
  ),
  rolled AS (
    SELECT day, rev_c,
           COUNT(*) OVER fr AS cnt,
           SUM(rev_c) OVER fr AS s,
           SUM(CAST(rev_c AS HUGEINT) * rev_c) OVER fr AS q
    FROM daily
    WINDOW fr AS (ORDER BY day
                  ROWS BETWEEN {BOLL_W - 1} PRECEDING AND CURRENT ROW)
  )
  SELECT day,
         CAST(rev_c AS DOUBLE) / {SCALE}.0 AS revenue,
         CAST(CASE WHEN CAST(rev_c AS HUGEINT) * {BOLL_W}
              > CAST(s AS HUGEINT) THEN 1 ELSE -1 END AS INT) AS side,
         CAST((CAST(rev_c AS HUGEINT) * {BOLL_W} - s)
              * (CAST(rev_c AS HUGEINT) * {BOLL_W} - s) * 1000000
              // GREATEST(CAST(q AS HUGEINT) * {BOLL_W}
                          - CAST(s AS HUGEINT) * s, 1) AS BIGINT)
           AS z2_ppm,
         CAST(s AS DOUBLE) / {BOLL_W} / {SCALE}.0 AS roll_mean
  FROM rolled
  WHERE cnt = {BOLL_W}
    AND (CAST(rev_c AS HUGEINT) * {BOLL_W} - s)
        * (CAST(rev_c AS HUGEINT) * {BOLL_W} - s)
        > {BOLL_K * BOLL_K} * (CAST(q AS HUGEINT) * {BOLL_W}
                               - CAST(s AS HUGEINT) * s)
  ORDER BY day
"""


# -- RSI momentum scan --------------------------------------------------------------

RSI_P = 14  # diffs per RSI window (Cutler's SMA variant)
RSI_HI = 600_000  # overbought threshold, ppm
RSI_LO = 400_000  # oversold threshold, ppm


def q_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI momentum scan of daily revenue (Cutler's SMA variant): days
    whose {RSI_P}-diff relative-strength index leaves the
    [{RSI_LO}, {RSI_HI}] ppm neutral zone — the DIRECTIONAL read the
    band charts don't give (Bollinger/XmR flag "far from center";
    RSI flags "gains have dominated losses for two weeks straight",
    catching sustained one-sided grinds that never leave the band).
    SEVENTH finisher on the shared ``peaks_state`` daily monoid.

    Exactness: day-over-day diffs of exact cents split into gain/loss
    parts (a lag over the |days|-bounded state); G and L are rolling
    {RSI_P}-row integer sums; RSI = G·10⁶ div (G+L) is ONE exact ppm
    floor division through DECIMAL(38)/HUGEINT (Cutler's SMA form is
    order-exact — Wilder's EWMA would drag an infinite float tail).
    Only full windows ({RSI_P} diffs) are scored.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's monitoring family.
    """
    return rsi_report(peaks_state(load_table(spark, sf_dir, "orders")))


def rsi_report(state: DataFrame) -> DataFrame:
    """Close the RSI scan over any (day, rev_c) daily state
    (|days|-bounded)."""
    d = state.select(
        "day",
        F.expr("rev_c - lag(rev_c) over (order by day)").alias("d"),
    ).filter("d is not null")
    w = W.orderBy("day").rowsBetween(-(RSI_P - 1), 0)
    rolled = d.select(
        "day",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum(F.expr("greatest(d, 0)")).over(w).alias("g"),
        F.sum(F.expr("greatest(-d, 0)")).over(w).alias("l"),
    )
    rsi = (
        "CAST(CAST(g AS DECIMAL(38,0)) * 1000000"
        " div greatest(CAST(g AS DECIMAL(38,0)) + l, 1) AS BIGINT)"
    )
    return (
        rolled.filter(f"cnt = {RSI_P}")
        .filter(f"({rsi}) >= {RSI_HI} OR ({rsi}) <= {RSI_LO}")
        .selectExpr(
            "day",
            f"({rsi}) AS rsi_ppm",
            f"CAST(CASE WHEN ({rsi}) >= {RSI_HI} THEN 'overbought'"
            " ELSE 'oversold' END AS STRING) AS signal",
            "g AS gain_c",
            "l AS loss_c",
        )
        .orderBy("day")
    )


ORACLE["q_rsi"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
             AS rev_c
    FROM orders GROUP BY 1
  ),
  diffs AS (
    SELECT day, rev_c - LAG(rev_c) OVER (ORDER BY day) AS d
    FROM daily
    QUALIFY d IS NOT NULL
  ),
  rolled AS (
    SELECT day,
           COUNT(*) OVER fr AS cnt,
           SUM(GREATEST(d, 0)) OVER fr AS g,
           SUM(GREATEST(-d, 0)) OVER fr AS l
    FROM diffs
    WINDOW fr AS (ORDER BY day
                  ROWS BETWEEN {RSI_P - 1} PRECEDING AND CURRENT ROW)
  ),
  scored AS (
    SELECT day, g, l,
           CAST(CAST(g AS HUGEINT) * 1000000
                // GREATEST(CAST(g AS HUGEINT) + l, 1) AS BIGINT)
             AS rsi_ppm
    FROM rolled WHERE cnt = {RSI_P}
  )
  SELECT day, rsi_ppm,
         CASE WHEN rsi_ppm >= {RSI_HI} THEN 'overbought'
              ELSE 'oversold' END AS signal,
         CAST(g AS BIGINT) AS gain_c, CAST(l AS BIGINT) AS loss_c
  FROM scored
  WHERE rsi_ppm >= {RSI_HI} OR rsi_ppm <= {RSI_LO}
  ORDER BY day
"""


# -- MASE forecast-skill panel -------------------------------------------------------

MASE_SEASON = 7  # seasonal-naive lag, observed days


def q_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE forecast-skill panel of daily revenue: does the
    seasonal-naive forecast (repeat the value from {MASE_SEASON}
    observed days back) beat the plain naive forecast (repeat
    yesterday)? The one-row go/no-go a forecasting review starts
    from — MASE < 1 says the weekly pattern carries real signal worth
    modeling (and is the standard scale-free skill score, comparable
    across series). EIGHTH finisher on the shared ``peaks_state``
    daily monoid — ``stream_peaks`` maintains the state; the skill
    panel closes on demand.

    Exactness: both error sums are plain integer sums of |diffs| of
    exact cents over the SAME scored suffix (days with both lags
    observed, so the comparison is apples-to-apples); the skill ratio
    is ONE exact ppm floor division. Lags are row-position lags over
    the observed-day sequence (the q_rsi convention — on a dense
    calendar this IS the weekly lag; on sparse series it is the
    "7 observations back" analogue, identical on both engines).
    The window runs over the |calendar days|-bounded daily state.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's forecasting family.
    """
    return mase_report(peaks_state(load_table(spark, sf_dir, "orders")))


def mase_report(state: DataFrame) -> DataFrame:
    """Close the MASE skill panel over any (day, rev_c) daily state
    (|days|-bounded)."""
    w = W.orderBy("day")
    lagged = state.select(
        "rev_c",
        F.lag("rev_c", 1).over(w).alias("p1"),
        F.lag("rev_c", MASE_SEASON).over(w).alias("p7"),
    ).filter("p7 is not null")
    return lagged.agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(F.expr("abs(rev_c - p1)")).alias("sae_naive_c"),
        F.sum(F.expr("abs(rev_c - p7)")).alias("sae_seasonal_c"),
    ).selectExpr(
        "n_scored",
        "sae_naive_c",
        "sae_seasonal_c",
        "sae_seasonal_c * 1000000 div greatest(sae_naive_c, 1)"
        " AS mase_ppm",
        "CAST(sae_seasonal_c < sae_naive_c AS INT) AS seasonal_better",
    )


ORACLE["q_mase"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           SUM(CAST(FLOOR(o_totalprice * {{SCALE}} + 0.5) AS BIGINT))
             AS rev_c
    FROM orders GROUP BY 1
  ),
  lagged AS (
    SELECT rev_c,
           LAG(rev_c, 1) OVER (ORDER BY day) AS p1,
           LAG(rev_c, {MASE_SEASON}) OVER (ORDER BY day) AS p7
    FROM daily
    QUALIFY p7 IS NOT NULL
  ),
  agg AS (
    SELECT COUNT(*) AS n_scored,
           CAST(SUM(ABS(rev_c - p1)) AS BIGINT) AS sae_naive_c,
           CAST(SUM(ABS(rev_c - p7)) AS BIGINT) AS sae_seasonal_c
    FROM lagged
  )
  SELECT CAST(n_scored AS BIGINT) AS n_scored, sae_naive_c,
         sae_seasonal_c,
         CAST(sae_seasonal_c * 1000000
              // GREATEST(sae_naive_c, 1) AS BIGINT) AS mase_ppm,
         CAST(sae_seasonal_c < sae_naive_c AS INT) AS seasonal_better
  FROM agg
"""
ORACLE["q_mase"] = ORACLE["q_mase"].replace("{SCALE}", str(SCALE))


# -- growth accounting --------------------------------------------------------------


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting of weekly active users: every week's
    actives split into NEW (first week ever), RETAINED (also active
    the previous week), and RESURRECTED (active before, but not last
    week), plus the week's CHURNED (active last week, gone now) — the
    standard product-growth panel (active ≡ new + retained +
    resurrected, every week) that says WHY the WAU curve moved, not
    just that it did; the flow complement of q_active_users /
    q_retention_cohorts.

    Scale shape: everything reduces to the distinct (user, week) grid
    (``growth_grid`` — one shuffle, grid-sized, independent of raw
    event volume; an idempotent SET monoid ``stream_growth``
    maintains live); classification is one lag/lead window pass KEYED
    BY USER over the grid (thousands of parallel partitions, never
    one-partition), churn attribution one more grid-sized groupBy,
    and the week arms meet in a full-outer join on the
    |weeks|-bounded axis (a gap week can hold churn yet zero
    actives). Users active in the final observed week cannot churn
    yet — the horizon guard joins broadcast.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's engagement family.
    """
    return growth_report(growth_grid(load_table(spark, sf_dir, "events")))


def growth_grid(events: DataFrame) -> DataFrame:
    """The distinct (user_id, wi) week-activity grid, wi = FLOORED
    epoch day // 7 (integer week index, so gap arithmetic is plain
    subtraction) — an idempotent SET monoid (merge = union+distinct),
    |users × weeks| rows forever.  The week division floors toward
    negative infinity (same remainder trick as ``sql_epoch_day``);
    the DuckDB oracle carries the IDENTICAL floor form because plain
    ``//`` there truncates toward zero on pre-1970 days (-8 // 7 =
    -1, not -2) and would widen the week-0 bin (ADVICE r9)."""
    day = sql_epoch_day(events, "ts")
    return (
        events.select(
            "user_id", F.expr(f"cast({day} as bigint)").alias("d")
        )
        .select(
            "user_id",
            F.expr("cast((d - ((d % 7) + 7) % 7) div 7 as int)").alias(
                "wi"
            ),
        )
        .distinct()
    )


def growth_report(grid: DataFrame) -> DataFrame:
    """Close the growth-accounting panel over any (user_id, wi)
    week-activity grid."""
    w = W.partitionBy("user_id").orderBy("wi")
    seq = grid.select(
        "user_id",
        "wi",
        F.lag("wi").over(w).alias("prev"),
        F.lead("wi").over(w).alias("nxt"),
    )
    mx = grid.agg(F.max("wi").alias("max_wi"))
    flows = seq.groupBy("wi").agg(
        F.count(F.lit(1)).alias("active"),
        F.sum(F.expr("cast(prev is null as int)")).alias("new_users"),
        F.sum(F.expr("cast(prev = wi - 1 as int)")).alias("retained"),
        F.sum(
            F.expr("cast(prev is not null and prev < wi - 1 as int)")
        ).alias("resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(mx))
        .filter("(nxt is null and wi < max_wi) or nxt > wi + 1")
        .groupBy(F.expr("wi + 1").alias("wi"))
        .agg(F.count(F.lit(1)).alias("churned"))
    )
    # union + SUM groupBy instead of a full-outer join (r12): BHJ
    # cannot take FULL OUTER, so the two |weeks|-bounded grids paid a
    # sort-merge join; each wi appears at most once per side, so
    # 0-padding + SUM reproduces the outer join's coalesce exactly.
    # (the inner coalesces also cover flows' own NULL sums: SUM of an
    # all-NULL retained/resurrected group is NULL, which the old outer
    # coalesce absorbed)
    merged = (
        flows.selectExpr(
            "wi",
            "active",
            "coalesce(new_users, 0) AS new_users",
            "coalesce(retained, 0) AS retained",
            "coalesce(resurrected, 0) AS resurrected",
            "CAST(0 AS BIGINT) AS churned",
        )
        .unionByName(
            churn.selectExpr(
                "wi", "CAST(0 AS BIGINT) AS active",
                "CAST(0 AS BIGINT) AS new_users",
                "CAST(0 AS BIGINT) AS retained",
                "CAST(0 AS BIGINT) AS resurrected", "churned",
            )
        )
        .groupBy("wi")
        .agg(
            F.sum("active").alias("active"),
            F.sum("new_users").alias("new_users"),
            F.sum("retained").alias("retained"),
            F.sum("resurrected").alias("resurrected"),
            F.sum("churned").alias("churned"),
        )
    )
    return (
        merged.selectExpr(
            "wi * 7 AS week_start_day",
            "active",
            "new_users",
            "retained",
            "resurrected",
            "churned",
        )
        .orderBy("week_start_day")
    )


ORACLE["q_growth_accounting"] = """
  WITH grid AS (
    -- floored week index, NOT plain // (which truncates toward zero
    -- on pre-1970 days); identical form to the Spark side
    SELECT DISTINCT user_id,
           (d - ((d % 7) + 7) % 7) // 7 AS wi
    FROM (SELECT user_id,
                 datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
          FROM events)
  ),
  seq AS (
    SELECT user_id, wi,
           LAG(wi) OVER (PARTITION BY user_id ORDER BY wi) AS prev,
           LEAD(wi) OVER (PARTITION BY user_id ORDER BY wi) AS nxt
    FROM grid
  ),
  mx AS (SELECT MAX(wi) AS max_wi FROM grid),
  flows AS (
    SELECT wi, COUNT(*) AS active,
           CAST(SUM(CAST(prev IS NULL AS INT)) AS BIGINT) AS new_users,
           CAST(SUM(CAST(prev = wi - 1 AS INT)) AS BIGINT) AS retained,
           CAST(SUM(CAST(prev IS NOT NULL AND prev < wi - 1 AS INT))
                AS BIGINT) AS resurrected
    FROM seq GROUP BY 1
  ),
  churn AS (
    SELECT wi + 1 AS wi, COUNT(*) AS churned
    FROM seq, mx
    WHERE (nxt IS NULL AND wi < max_wi) OR nxt > wi + 1
    GROUP BY 1
  )
  SELECT CAST(wi * 7 AS BIGINT) AS week_start_day,
         COALESCE(active, 0) AS active,
         COALESCE(new_users, 0) AS new_users,
         COALESCE(retained, 0) AS retained,
         COALESCE(resurrected, 0) AS resurrected,
         COALESCE(churned, 0) AS churned
  FROM flows FULL OUTER JOIN churn USING (wi)
  ORDER BY week_start_day
"""


# -- Bass diffusion fit --------------------------------------------------------------


def q_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Bass diffusion fit of customer adoption: weekly FIRST
    purchases N_t regressed on cumulative adopters, N_t = a + b·C_{t−1}
    + c·C²_{t−1}, giving the innovation coefficient p, imitation
    coefficient q, and market-size estimate m̂ — the canonical
    product-diffusion read (is growth word-of-mouth driven? where is
    saturation?) next to q_growth_accounting's descriptive flows.

    Exactness: the state is the per-customer first-order week (an
    idempotent MIN monoid — ``stream_bass`` maintains it live)
    collapsed to the |weeks|-bounded adopters grid, gap-filled over
    the observed span (zero-adopter weeks are real observations);
    C_{t−1} is one range-partitioned exclusive prefix sum, the seven
    normal-equation power sums accumulate in DECIMAL(38)/HUGEINT
    (exact while C⁴·weeks < 10³⁸ — beyond 10⁸ adopters the x⁴ column
    saturates both engines identically wide), and the Cramer
    determinants + root close as fixed-order double expressions with
    sqrt (IEEE-exact) — byte-identical text on both engines;
    degenerate grids yield NULL estimates.

    Scale shape: ONE partial-aggregated groupBy to |customers| first
    weeks, ONE to the |weeks| grid; everything after is bounded.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's forecasting family
    (q_holt_winters / q_croston / q_mase).
    """
    return bass_report(bass_state(load_table(spark, sf_dir, "orders")), spark)


def bass_state(orders: DataFrame) -> DataFrame:
    """The per-week adopters grid (wi, adopters) from each customer's
    FIRST order week — the per-customer MIN is the live state
    (idempotent), the grid its bounded projection."""
    return bass_grid(bass_firsts(orders))


def bass_firsts(orders: DataFrame) -> DataFrame:
    """The KEYED per-customer first-order week — an idempotent MIN
    monoid (``stream_bass`` merges per-batch firsts by customer)."""
    day = sql_epoch_day(orders, "o_orderdate")
    return (
        orders.select(
            "o_custkey",
            F.expr(f"cast({day} as bigint)").alias("d"),
        )
        .select(
            "o_custkey",
            F.expr("cast((d - ((d % 7) + 7) % 7) div 7 as int)").alias("wi"),
        )
        .groupBy("o_custkey")
        .agg(F.min("wi").alias("first_wi"))
    )


def bass_grid(firsts: DataFrame) -> DataFrame:
    """Bounded adopters re-grid over any keyed first-week state."""
    return firsts.groupBy(F.col("first_wi").alias("wi")).agg(
        F.count(F.lit(1)).alias("adopters")
    )


def bass_report(grid: DataFrame, spark: SparkSession) -> DataFrame:
    """Close the Bass fit over any (wi, adopters) adoption grid."""
    from locopy_spark.operators.ranking import global_running_sum

    span = grid.agg(
        F.min("wi").alias("lo"), F.max("wi").alias("hi")
    )
    weeks = span.selectExpr("explode(sequence(lo, hi)) AS wi")
    filled = (
        weeks.join(grid, "wi", "left")
        .selectExpr("wi", "coalesce(adopters, 0) AS n_t")
    )
    # bounded arm (r12): the filled adoption grid is |weeks|-sized at
    # any volume.
    cum = global_running_sum(
        filled, order_cols=["wi"], value_col="n_t", out_col="c_prev",
        bounded=True,
    )
    agg = cum.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum(F.expr("cast(c_prev as decimal(38,0))")).alias("s1"),
        F.sum(F.expr("cast(c_prev as decimal(38,0)) * c_prev")).alias("s2"),
        F.sum(
            F.expr("cast(c_prev as decimal(38,0)) * c_prev * c_prev")
        ).alias("s3"),
        F.sum(
            F.expr(
                "cast(cast(c_prev as decimal(38,0)) * c_prev as decimal(38,0))"
                " * (cast(c_prev as decimal(38,0)) * c_prev)"
            )
        ).alias("s4"),
        F.sum("n_t").alias("sy"),
        F.sum(F.expr("cast(c_prev as decimal(38,0)) * n_t")).alias("sxy"),
        F.sum(
            F.expr("cast(c_prev as decimal(38,0)) * c_prev * n_t")
        ).alias("sx2y"),
    )
    # Cramer's rule on the 3×3 normal equations in fixed-order doubles
    # over the exact sums; then m̂ = larger root of c·m² + b·m + a = 0
    # (the market size where adoption stops), p = a/m̂, q = b + p.
    d_terms = {
        "det": "(CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
               " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
               " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
               " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
               " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
               " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))",
        "det_a": "(CAST(sy AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
                 " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
                 " - CAST(s1 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
                 " - CAST(s3 AS DOUBLE) * CAST(sx2y AS DOUBLE))"
                 " + CAST(s2 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE)"
                 " - CAST(s2 AS DOUBLE) * CAST(sx2y AS DOUBLE)))",
        "det_b": "(CAST(s0 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
                 " - CAST(s3 AS DOUBLE) * CAST(sx2y AS DOUBLE))"
                 " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
                 " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
                 " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sx2y AS DOUBLE)"
                 " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE)))",
        "det_c": "(CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(sx2y AS DOUBLE)"
                 " - CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE))"
                 " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sx2y AS DOUBLE)"
                 " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE))"
                 " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
                 " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))",
    }
    coef = agg.selectExpr(
        "s0 AS n_weeks",
        "sy AS total_adopters",
        f"CASE WHEN {d_terms['det']} = 0.0 THEN NULL ELSE"
        f" {d_terms['det_a']} / {d_terms['det']} END AS coef_a",
        f"CASE WHEN {d_terms['det']} = 0.0 THEN NULL ELSE"
        f" {d_terms['det_b']} / {d_terms['det']} END AS coef_b",
        f"CASE WHEN {d_terms['det']} = 0.0 THEN NULL ELSE"
        f" {d_terms['det_c']} / {d_terms['det']} END AS coef_c",
    )
    return coef.selectExpr(
        "n_weeks",
        "total_adopters",
        "coef_a",
        "coef_b",
        "coef_c",
        "CASE WHEN coef_c IS NULL OR coef_c >= 0.0"
        " OR coef_b * coef_b - 4.0 * coef_c * coef_a < 0.0 THEN NULL ELSE"
        " (-coef_b - sqrt(coef_b * coef_b - 4.0 * coef_c * coef_a))"
        " / (2.0 * coef_c) END AS m_hat",
    ).selectExpr(
        "n_weeks",
        "total_adopters",
        "coef_a",
        "coef_b",
        "coef_c",
        "m_hat",
        "CASE WHEN m_hat IS NULL OR m_hat = 0.0 THEN NULL ELSE"
        " coef_a / m_hat END AS p_hat",
        "CASE WHEN m_hat IS NULL OR m_hat = 0.0 THEN NULL ELSE"
        " coef_b + coef_a / m_hat END AS q_hat",
    )


def _sql_bass() -> str:
    det = ("(CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
           " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
           " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
           " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
           " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
           " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))")
    det_a = ("(CAST(sy AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
             " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
             " - CAST(s1 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
             " - CAST(s3 AS DOUBLE) * CAST(sx2y AS DOUBLE))"
             " + CAST(s2 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE)"
             " - CAST(s2 AS DOUBLE) * CAST(sx2y AS DOUBLE)))")
    det_b = ("(CAST(s0 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
             " - CAST(s3 AS DOUBLE) * CAST(sx2y AS DOUBLE))"
             " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
             " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
             " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sx2y AS DOUBLE)"
             " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE)))")
    det_c = ("(CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(sx2y AS DOUBLE)"
             " - CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE))"
             " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sx2y AS DOUBLE)"
             " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE))"
             " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
             " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))")
    return f"""
  WITH firsts AS (
    -- floored week index (matches Spark; plain // truncates pre-1970)
    SELECT o_custkey,
           MIN((d - ((d % 7) + 7) % 7) // 7) AS wi
    FROM (SELECT o_custkey,
                 datediff('day', DATE '1970-01-01',
                          CAST(o_orderdate AS DATE)) AS d
          FROM orders) GROUP BY 1
  ),
  grid AS (
    SELECT wi, COUNT(*) AS adopters FROM firsts GROUP BY 1
  ),
  span AS (SELECT MIN(wi) AS lo, MAX(wi) AS hi FROM grid),
  weeks AS (
    SELECT UNNEST(range(lo, hi + 1)) AS wi FROM span
  ),
  filled AS (
    SELECT w.wi, COALESCE(g.adopters, 0) AS n_t
    FROM weeks w LEFT JOIN grid g ON w.wi = g.wi
  ),
  cum AS (
    SELECT wi, n_t,
           CAST(COALESCE(SUM(n_t) OVER (
             ORDER BY wi ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS c_prev
    FROM filled
  ),
  agg AS (
    SELECT COUNT(*) AS s0,
           SUM(CAST(c_prev AS HUGEINT)) AS s1,
           SUM(CAST(c_prev AS HUGEINT) * c_prev) AS s2,
           SUM(CAST(c_prev AS HUGEINT) * c_prev * c_prev) AS s3,
           SUM((CAST(c_prev AS HUGEINT) * c_prev)
               * (CAST(c_prev AS HUGEINT) * c_prev)) AS s4,
           CAST(SUM(n_t) AS BIGINT) AS sy,
           SUM(CAST(c_prev AS HUGEINT) * n_t) AS sxy,
           SUM(CAST(c_prev AS HUGEINT) * c_prev * n_t) AS sx2y
    FROM cum
  ),
  coef AS (
    SELECT CAST(s0 AS BIGINT) AS n_weeks, sy AS total_adopters,
           CASE WHEN {det} = 0.0 THEN NULL ELSE
             {det_a} / {det} END AS coef_a,
           CASE WHEN {det} = 0.0 THEN NULL ELSE
             {det_b} / {det} END AS coef_b,
           CASE WHEN {det} = 0.0 THEN NULL ELSE
             {det_c} / {det} END AS coef_c
    FROM agg
  ),
  rooted AS (
    SELECT *,
           CASE WHEN coef_c IS NULL OR coef_c >= 0.0
             OR coef_b * coef_b - 4.0 * coef_c * coef_a < 0.0 THEN NULL ELSE
             (-coef_b - sqrt(coef_b * coef_b - 4.0 * coef_c * coef_a))
             / (2.0 * coef_c) END AS m_hat
    FROM coef
  )
  SELECT n_weeks, total_adopters, coef_a, coef_b, coef_c, m_hat,
         CASE WHEN m_hat IS NULL OR m_hat = 0.0 THEN NULL ELSE
           coef_a / m_hat END AS p_hat,
         CASE WHEN m_hat IS NULL OR m_hat = 0.0 THEN NULL ELSE
           coef_b + coef_a / m_hat END AS q_hat
  FROM rooted
"""


ORACLE["q_bass_diffusion"] = _sql_bass()


# -- net dollar retention ------------------------------------------------------------


def q_ndr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net dollar retention by year: for each year's active customer
    cohort, the exact revenue THE SAME customers produced the next
    year, as a ppm ratio — the SaaS-standard expansion/contraction/
    churn net (NDR > 1e6 means existing customers alone grew revenue)
    plus logo retention, the count companion.  The revenue-weighted
    complement of q_growth_accounting's user flows and q_cohort_ltv's
    cumulative curves.

    Exactness & streaming: the state is the per-(customer, year)
    revenue-cent grid — ONE partial-aggregated groupBy, a plain-sum
    monoid keyed by (customer, year) that ``stream_ndr`` maintains
    live; the finisher self-joins the grid on (customer, year+1)
    (grid-sized equi-join, co-partitioned on the customer key) and
    closes per-year ratios as exact floor divisions widened through
    DECIMAL(38)/HUGEINT.  The final observed year has no next-year
    data and is excluded by the |years|-bounded horizon guard.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's engagement family.
    """
    return ndr_report(ndr_state(load_table(spark, sf_dir, "orders")))


def ndr_state(orders: DataFrame) -> DataFrame:
    """The per-(customer, year) revenue-cent grid — a plain-sum
    monoid.  Shared by ``q_ndr`` and ``streaming.stateful
    .stream_ndr``."""
    return (
        orders.select(
            "o_custkey",
            F.expr("year(o_orderdate)").alias("yr"),
            F.expr(
                f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)"
            ).alias("rev_c"),
        )
        .groupBy("o_custkey", "yr")
        .agg(F.sum("rev_c").alias("rev_c"))
    )


def ndr_report(grid: DataFrame) -> DataFrame:
    """Close the per-year NDR panel over any (o_custkey, yr, rev_c)
    grid.  The grid feeds THREE consumers (base side, shifted side,
    horizon) — persist it so the orders aggregate runs ONCE."""
    from locopy_spark.functions.cache import managed_persist

    grid = managed_persist(grid, "ndr")
    nxt = grid.select(
        "o_custkey",
        F.expr("yr - 1").alias("yr"),
        F.col("rev_c").alias("rev_next_c"),
    )
    joined = grid.join(nxt, ["o_custkey", "yr"], "left")
    horizon = grid.agg(F.max("yr").alias("max_yr"))
    per_year = (
        joined.groupBy("yr")
        .agg(
            F.count(F.lit(1)).alias("n_base"),
            F.sum(
                F.expr("cast(rev_next_c is not null as bigint)")
            ).alias("n_retained"),
            F.sum("rev_c").alias("rev_base_c"),
            F.sum(F.expr("coalesce(rev_next_c, 0)")).alias("rev_next_c"),
        )
        .crossJoin(F.broadcast(horizon))
        .filter("yr < max_yr")
    )
    return per_year.selectExpr(
        "yr",
        "n_base",
        "n_retained",
        "rev_base_c",
        "rev_next_c",
        "cast(cast(rev_next_c as decimal(38,0)) * 1000000"
        " div greatest(rev_base_c, 1) as bigint) AS ndr_ppm",
        "cast(cast(n_retained as decimal(38,0)) * 1000000"
        " div greatest(n_base, 1) as bigint) AS logo_ppm",
    ).orderBy("yr")


ORACLE["q_ndr"] = f"""
  WITH grid AS (
    SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS rev_c
    FROM orders GROUP BY 1, 2
  ),
  joined AS (
    SELECT g.yr, g.rev_c, n.rev_c AS rev_next_c
    FROM grid g LEFT JOIN grid n
      ON n.o_custkey = g.o_custkey AND n.yr = g.yr + 1
  ),
  horizon AS (SELECT MAX(yr) AS max_yr FROM grid),
  per_year AS (
    SELECT yr, COUNT(*) AS n_base,
           CAST(SUM(CAST(rev_next_c IS NOT NULL AS BIGINT)) AS BIGINT)
             AS n_retained,
           CAST(SUM(rev_c) AS BIGINT) AS rev_base_c,
           CAST(SUM(COALESCE(rev_next_c, 0)) AS BIGINT) AS rev_next_c
    FROM joined, horizon WHERE yr < max_yr GROUP BY yr
  )
  SELECT CAST(yr AS BIGINT) AS yr, CAST(n_base AS BIGINT) AS n_base,
         n_retained, rev_base_c, rev_next_c,
         CAST(CAST(rev_next_c AS HUGEINT) * 1000000
              // GREATEST(rev_base_c, 1) AS BIGINT) AS ndr_ppm,
         CAST(CAST(n_retained AS HUGEINT) * 1000000
              // GREATEST(n_base, 1) AS BIGINT) AS logo_ppm
  FROM per_year ORDER BY yr
"""
