"""Trend-fitting / distribution-conformance analytics: grouped OLS
regression, Holt's linear smoothing, Theil–Sen robust slopes, and
Benford first-digit conformance.

The regression/forecast workloads a locopy user runs on the warehouse
after the COPY lands (reference: locopy/redshift.py:235 leaves
analysis to user SQL), re-expressed Spark-first under the repo's
determinism rules (SURVEY §4): every sufficient statistic is an exact
integer/DECIMAL aggregate (associative, partition-order independent),
and the only floating-point is a closing formula written ONCE in
Python and formatted verbatim into both the Spark projection and the
DuckDB oracle — identical IEEE expression text, identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from locopy_spark.functions.numeric import SCALE, sql_epoch_day
from locopy_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}

# -- grouped OLS trend ------------------------------------------------------

OLS_EPOCH = "1992-01-01"  # day index origin (t = days since epoch)

# The closing formulas over the exact aggregates (n, st, stt bigint;
# sy, sty, syy 128-bit-exact sums of cents — Spark DECIMAL(38,0),
# DuckDB HUGEINT): ONE definition, interpolated into both engines.
# Everything stays INTEGER until the final projection: slope and
# intercept close as round-toward-zero scaled ratios (micro-cents)
# and R² as a ppb ratio, so the one CAST-to-DOUBLE each output takes
# is of an integer far below 2^53 — measured necessity, not caution:
# DuckDB's int128→double conversion is NOT correctly rounded (1 ulp
# high on e.g. 23729908596354439076), so any formula that casts a
# >2^53 exact integer diverges from Spark's BigDecimal path by 1 ulp
# (the q_anomaly_days whole-unit-descaling lesson, mining.py).
_OLS_NUM_S = "(n * sty - st * sy)"  # n·Σty − Σt·Σy   (slope numerator)
_OLS_DEN_T = "(n * stt - st * st)"  # n·Σt² − (Σt)²   (t variance · n²)
_OLS_NUM_Y = "(n * syy - sy * sy)"  # n·Σy² − (Σy)²   (y variance · n²)


def _signed_ratio(num: str, den: str, scale: int, fd: str) -> str:
    """Exact scaled ratio with round-toward-zero semantics: sign(num)
    · (|num|·scale div den), den > 0.  ABS keeps the floor-division
    operands non-negative — the regime where Spark ``div`` and DuckDB
    ``//`` agree (negative floor/truncate semantics differ)."""
    return (
        f"(CASE WHEN {num} < 0 THEN -1 ELSE 1 END)"
        f" * (ABS({num}) * {scale} {fd} {den})"
    )


def _ols_formulas(fd: str, wide: str) -> dict[str, str]:
    """The three closing projections for integer-division operator
    ``fd`` and 128-bit-exact widening type ``wide`` (Spark: ``div`` /
    DECIMAL(38,0); DuckDB: ``//`` / HUGEINT — DuckDB demotes a
    beyond-38-precision DECIMAL product to DOUBLE, whose ``//`` is an
    inexact float floor, while Spark has no int128 and needs the
    decimal).  slope/intercept close in micro-cents (·1e6), R² in
    ppb; each is an exact bigint-ranged integer cast once to double
    (exact: all < 2^53), then descaled.  R² headroom: num_s² must fit
    128 bits → |num_s| < ~1.3e19, i.e. bigint-ranged — beyond that,
    descale y to whole dollars."""
    slope_micro = _signed_ratio(_OLS_NUM_S, _OLS_DEN_T, 10**6, fd)
    icpt_micro = _signed_ratio(
        f"(sy * {_OLS_DEN_T} - {_OLS_NUM_S} * st)",
        f"(n * {_OLS_DEN_T})",
        10**6,
        fd,
    )
    # the inner quotient num_s²/den_t can pass 2^63 (measured at
    # sf0.1: ~6.5e19), and Spark's ``div`` returns BIGINT — it WRAPPED
    # silently there (round-10 sf0.1 sweep caught it; the sf0.01 gate
    # never could, the quotient scales ~sf³).  On the Spark side the
    # inner floor division therefore runs entirely in DECIMAL via the
    # subtract-remainder identity a div b = (a − a % b) / b — the
    # subtraction makes the dividend an exact multiple, so the scale-6
    # decimal division is exact and the DECIMAL(38,0) cast loses
    # nothing (operands non-negative: num_s² ≥ 0, den_t > 0 guarded).
    # DuckDB's ``//`` stays on HUGEINT, exact as before.
    ns2 = f"({_OLS_NUM_S} * {_OLS_NUM_S})"
    if fd == "div":
        inner = (
            f"CAST(({ns2} - ({ns2} % {_OLS_DEN_T})) / {_OLS_DEN_T}"
            f" AS {wide})"
        )
    else:
        inner = f"CAST({ns2} {fd} {_OLS_DEN_T} AS {wide})"
    r2_ppb = f"({inner} * 1000000000 {fd} {_OLS_NUM_Y})"
    # single-day / constant-y groups (possible mid-stream) zero the
    # den_t / num_y divisors: NULL, not an ANSI divide crash — the
    # guard wraps BOTH engines' text identically via this generator
    return {
        # micro-cents/day → dollars/day
        "slope_dollars_per_day": (
            f"CASE WHEN {_OLS_DEN_T} = 0 THEN CAST(NULL AS DOUBLE) ELSE"
            f" CAST(CAST({slope_micro} AS BIGINT) AS DOUBLE) / 100000000.0 END"
        ),
        "intercept_dollars": (
            f"CASE WHEN {_OLS_DEN_T} = 0 THEN CAST(NULL AS DOUBLE) ELSE"
            f" CAST(CAST({icpt_micro} AS BIGINT) AS DOUBLE) / 100000000.0 END"
        ),
        "r2": (
            f"CASE WHEN {_OLS_DEN_T} = 0 OR {_OLS_NUM_Y} = 0"
            " THEN CAST(NULL AS DOUBLE) ELSE"
            f" CAST(CAST({r2_ppb} AS BIGINT) AS DOUBLE) / 1000000000.0 END"
        ),
    }


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority OLS fit of daily order revenue against time —
    closed-form linear regression (slope, intercept, R²) from one
    pass of exact mergeable power sums.

    Scale shape: the daily aggregation is the only input-sized
    shuffle; the regression itself runs on the |groups × days|-sized
    daily table with plain partial-aggregated sums (shuffle rows =
    group count). Sufficient statistics are exact: t and t² stay
    bigint (t ≤ ~2,500 days), y sums go through DECIMAL(27,0) casts
    so the y·y and t·y products never wrap bigint at warehouse scale
    (y is cent-scaled; bigint y² would overflow past ~$92 M/day).
    The slope/intercept/R² formulas are interpolated from ONE Python
    string into both engines — see module docstring.
    """
    o = load_table(spark, sf_dir, "orders")
    return ols_report(ols_daily(o))


def ols_daily(orders: DataFrame) -> DataFrame:
    """Per-(priority, day) exact revenue cents — the O(groups × days)
    sufficient state for the OLS fit.  An additive monoid in y (the
    day index t is a constant of the key), so a streaming maintainer
    can merge per-batch outputs by key and equal the batch pass on
    any batching/arrival order (stream_ols_trend)."""
    return orders.groupBy(
        "o_orderpriority", F.col("o_orderdate").alias("day")
    ).agg(
        F.expr(
            "cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))"
            " as bigint)"
        ).alias("y")
    )


def ols_report(daily: DataFrame) -> DataFrame:
    """Close the OLS fit over the daily state: one power-sum pass plus
    the shared exact-integer formulas."""
    sums = daily.withColumn(
        "t", F.expr(f"datediff(day, date'{OLS_EPOCH}')")
    ).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(t)").alias("st"),
        F.expr("sum(t * t)").alias("stt"),
        F.expr("sum(cast(y as decimal(27,0)))").alias("sy"),
        F.expr("sum(cast(t as decimal(27,0)) * y)").alias("sty"),
        F.expr("sum(cast(y as decimal(27,0)) * y)").alias("syy"),
    )
    return sums.selectExpr(
        "o_orderpriority",
        "n as n_days",
        *[
            f"{formula} AS {name}"
            for name, formula in _ols_formulas("div", "DECIMAL(38,0)").items()
        ],
    ).orderBy("o_orderpriority")


ORACLE["q_ols_trend"] = f"""
  WITH daily AS (
    SELECT o_orderpriority, o_orderdate AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS y,
           date_diff('day', DATE '{OLS_EPOCH}', o_orderdate) AS t
    FROM orders GROUP BY 1, 2
  ),
  sums AS (
    -- HUGEINT sums (not DECIMAL): DuckDB demotes a >38-precision
    -- decimal product to DOUBLE, which cost exactly 1 ulp of r2 in
    -- testing; int128 arithmetic stays exact like Spark's capped
    -- DECIMAL(38,0) path, and only doubles reach the output
    SELECT o_orderpriority,
           COUNT(*) AS n,
           SUM(t) AS st,
           SUM(t * t) AS stt,
           SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(t AS HUGEINT) * y) AS sty,
           SUM(CAST(y AS HUGEINT) * y) AS syy
    FROM daily GROUP BY 1
  )
  SELECT o_orderpriority, n AS n_days,
         {", ".join(f"{formula} AS {name}"
                    for name, formula in _ols_formulas("//", "HUGEINT").items())}
  FROM sums ORDER BY o_orderpriority
"""


# -- Holt's linear trend (double exponential smoothing) ---------------------

HOLT_START = "1997-10-01"  # bounded trailing series (q_exp_smooth regime)


def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend smoothing (level + trend) of daily order
    revenue with α = β = ½ — the forecasting upgrade of q_exp_smooth
    (mining.py:1022) that also tracks drift, made engine-exact: both
    recurrences are integer halvings on cent-scaled bigints,

        l_t = ⌊(x_t + l_{{t-1}} + b_{{t-1}}) / 2⌋
        b_t = ⌊(l_t − l_{{t-1}} + b_{{t-1}}) / 2⌋        (l_1=x_1, b_1=0)

    written as ``FLOOR(expr / 2.0)`` on BOTH engines (the trend term
    goes negative, where bigint ``div`` truncation semantics differ
    between engines — double halving + FLOOR floors identically as
    long as |expr| < 2^53, i.e. ~$90 T/day of headroom; Python's
    ``//`` floors the same). The daily aggregation is distributed;
    the inherently-sequential recurrence runs as ONE Arrow task over
    the bounded trailing window (|days| ≤ ~1,400 — same regime as
    q_exp_smooth), never a driver loop. Forecast column = l + b (the
    one-step-ahead prediction).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate") >= F.lit(HOLT_START).cast("date"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("x")
        )
    )

    def holt(pdf):
        pdf = pdf.sort_values("day").reset_index(drop=True)
        lvl, trd = None, 0
        ls, bs = [], []
        for x in pdf["x"].tolist():
            if lvl is None:
                lvl, trd = x, 0
            else:
                prev = lvl
                lvl = (x + lvl + trd) // 2
                trd = (lvl - prev + trd) // 2
            ls.append(lvl)
            bs.append(trd)
        pdf["l"] = ls
        pdf["b"] = bs
        return pdf

    sm = (
        daily.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(holt, "__g int, day date, x long, l long, b long")
    )
    return sm.select(
        "day",
        (F.col("x").cast("double") / 100.0).alias("revenue"),
        (F.col("l").cast("double") / 100.0).alias("level"),
        (F.col("b").cast("double") / 100.0).alias("trend"),
        ((F.col("l") + F.col("b")).cast("double") / 100.0).alias("forecast"),
    ).orderBy("day")


# l_t repeated inside the b_t expression (a recursive member cannot
# reference a sibling column) — built once here so the two copies
# cannot diverge.
_HOLT_L = "CAST(FLOOR((i.x + h.l + h.b) / 2.0) AS BIGINT)"
ORACLE["q_holt_linear"] = f"""
  WITH RECURSIVE d AS (
    SELECT o_orderdate AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders WHERE o_orderdate >= DATE '{HOLT_START}' GROUP BY 1
  ),
  idx AS (SELECT day, x, row_number() OVER (ORDER BY day) AS t FROM d),
  holt(t, day, x, l, b) AS (
    SELECT t, day, x, x, CAST(0 AS BIGINT) FROM idx WHERE t = 1
    UNION ALL
    SELECT i.t, i.day, i.x,
           {_HOLT_L},
           CAST(FLOOR(({_HOLT_L} - h.l + h.b) / 2.0) AS BIGINT)
    FROM idx i JOIN holt h ON i.t = h.t + 1
  )
  SELECT day, CAST(x AS DOUBLE) / 100.0 AS revenue,
         CAST(l AS DOUBLE) / 100.0 AS level,
         CAST(b AS DOUBLE) / 100.0 AS trend,
         CAST(l + b AS DOUBLE) / 100.0 AS forecast
  FROM holt ORDER BY day
"""


# -- Theil–Sen robust slope -------------------------------------------------

TS_EPOCH_Y = 1992  # month index origin


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority Theil–Sen estimator on the monthly revenue series:
    the median of all pairwise slopes — the robust trend that one
    outlier month cannot move (the companion to q_ols_trend's
    least-squares fit, which it sanity-checks).

    Scale shape: slopes are computed over the MONTHLY aggregate, so
    the O(k²) pair expansion is over k = |months| — a constant that
    does NOT grow with data volume (~82 months → ~3.3k pairs per
    group at any sf). Each slope is deterministic: milli-cents/month
    via ``FLOOR(Δy · 1000.0 / Δm)`` — the product stays double-exact
    below 2^53 (|Δy| < ~$90 B/month per group; descale past that),
    and both engines floor the same correctly-rounded quotient. The
    median is the repo's type-1 rank-select (value at ceil(n/2)),
    exact on any engine/partitioning; per-group windows stay bounded
    by the pair count.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        "o_orderpriority",
        F.expr(
            f"(year(o_orderdate) - {TS_EPOCH_Y}) * 12 +"
            " month(o_orderdate) - 1"
        ).alias("m"),
    ).agg(
        F.expr(
            "cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))"
            " as bigint)"
        ).alias("y")
    )
    pairs = (
        monthly.alias("a")
        .join(
            monthly.alias("b"),
            (F.expr("a.o_orderpriority = b.o_orderpriority"))
            & (F.expr("a.m < b.m")),
        )
        .select(
            F.expr("a.o_orderpriority").alias("o_orderpriority"),
            F.expr(
                "cast(floor(cast(b.y - a.y as double) * 1000.0"
                " / cast(b.m - a.m as double)) as bigint)"
            ).alias("s"),
        )
    )
    wr = Window.partitionBy("o_orderpriority").orderBy("s")
    wn = Window.partitionBy("o_orderpriority")
    med = (
        pairs.withColumn("__rn", F.row_number().over(wr))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .groupBy("o_orderpriority")
        .agg(
            F.max(
                F.expr(
                    "case when __rn = cast(ceil(0.5 * __n) as bigint)"
                    " then s end"
                )
            ).alias("med_s"),
            F.max("__n").alias("n_pairs"),
        )
    )
    return med.select(
        "o_orderpriority",
        "n_pairs",
        F.expr("CAST(med_s AS DOUBLE) / 100000.0").alias(
            "ts_slope_dollars_per_month"
        ),
    ).orderBy("o_orderpriority")


ORACLE["q_theil_sen"] = f"""
  WITH monthly AS (
    SELECT o_orderpriority,
           (year(o_orderdate) - {TS_EPOCH_Y}) * 12
             + month(o_orderdate) - 1 AS m,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS y
    FROM orders GROUP BY 1, 2
  ),
  pairs AS (
    SELECT a.o_orderpriority,
           CAST(FLOOR(CAST(b.y - a.y AS DOUBLE) * 1000.0
                      / CAST(b.m - a.m AS DOUBLE)) AS BIGINT) AS s
    FROM monthly a JOIN monthly b
      ON a.o_orderpriority = b.o_orderpriority AND a.m < b.m
  ),
  r AS (
    SELECT o_orderpriority, s,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY s) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM pairs
  )
  SELECT o_orderpriority,
         MAX(n) AS n_pairs,
         CAST(MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT)
                       THEN s END) AS DOUBLE) / 100000.0
           AS ts_slope_dollars_per_month
  FROM r GROUP BY 1 ORDER BY 1
"""


# -- Benford first-digit conformance ----------------------------------------

# exact-ppm Benford expectations: round(log10(1 + 1/d) * 1e6); the
# nine constants sum to exactly 1,000,000
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def _first_digit_case(v: str, floordiv: str) -> str:
    """First significant digit of a positive bigint — a CASE chain
    over powers of ten (no float log10, whose boundary rounding could
    disagree between engines at exact powers of 10); ``floordiv`` is
    the engine's integer-division operator (operands non-negative, so
    Spark ``div`` and DuckDB ``//`` agree)."""
    arms = "\n".join(
        f"WHEN {v} >= {10 ** p} THEN {v} {floordiv} {10 ** p}"
        for p in range(18, 0, -1)
    )
    return f"CASE {arms} ELSE {v} END"


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit conformance of order values per
    market segment — the classic fraud/synthetic-data screen: each
    segment's observed first-significant-digit distribution (exact
    ppm) against the Benford expectation, with an exact integer
    chi-square-style divergence per segment.

    Scale shape: one orders⨝customer join (AQE handles the shuffle;
    the segment dimension is on the customer row), then the digit
    projection is row-local codegen (a CASE chain over powers of 10 —
    no float log, whose rounding at exact powers of 10 could split
    engines) and everything after is a 9-digit × |segments| bounded
    aggregate. ppm shares go through DECIMAL products (c·1e6 wraps
    bigint at warehouse-scale counts); the per-digit divergence terms
    (obs−exp)² div exp are pure bigint (ppm-bounded operands).
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return benford_report(benford_counts(o, c))


def benford_counts(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Per-(segment, first-digit) counts — the 9×|segments| sufficient
    state, an additive monoid so a streaming maintainer can merge
    per-batch counts by key (stream_benford)."""
    v = "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_mktsegment",
            F.expr(_first_digit_case(v, "div")).alias("digit"),
        )
        .groupBy("c_mktsegment", "digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def benford_report(digits: DataFrame) -> DataFrame:
    """Close the conformance report over the bounded count state:
    exact ppm shares and the integer chi-square-style divergence."""
    wseg = Window.partitionBy("c_mktsegment")
    exp_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN {ppm}" for d, ppm in BENFORD_PPM.items()
    ) + " END"
    scored = (
        digits.withColumn("t", F.sum("n").over(wseg))
        .withColumn(
            "obs_ppm",
            F.expr("cast(cast(n as decimal(20,0)) * 1000000 div t as bigint)"),
        )
        .withColumn("exp_ppm", F.expr(f"cast({exp_case} as bigint)"))
        .withColumn(
            "dev",
            F.expr(
                "(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) div exp_ppm"
            ),
        )
    )
    return (
        scored.withColumn("chi2_ppm", F.sum("dev").over(wseg))
        .select(
            "c_mktsegment", "digit", "n", "obs_ppm", "exp_ppm", "chi2_ppm"
        )
        .orderBy("c_mktsegment", "digit")
    )


_BENFORD_EXP_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in BENFORD_PPM.items()
) + " END"
ORACLE["q_benford"] = f"""
  WITH digits AS (
    SELECT c_mktsegment,
           {_first_digit_case(
               "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)", "//")}
             AS digit,
           COUNT(*) AS n
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
  ),
  scored AS (
    SELECT c_mktsegment, digit, n,
           SUM(n) OVER (PARTITION BY c_mktsegment) AS t,
           CAST({_BENFORD_EXP_SQL} AS BIGINT) AS exp_ppm
    FROM digits
  ),
  ppm AS (
    SELECT c_mktsegment, digit, CAST(n AS BIGINT) AS n,
           CAST(CAST(n AS HUGEINT) * 1000000 // t AS BIGINT) AS obs_ppm,
           exp_ppm
    FROM scored
  ),
  dev AS (
    SELECT *,
           (obs_ppm - exp_ppm) * (obs_ppm - exp_ppm) // exp_ppm AS d
    FROM ppm
  )
  SELECT c_mktsegment, digit, n, obs_ppm, exp_ppm,
         CAST(SUM(d) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS chi2_ppm
  FROM dev ORDER BY c_mktsegment, digit
"""


# -- Holt–Winters seasonal smoothing ---------------------------------------

HW_PERIOD = 7  # weekly cycle over the evenly-indexed daily series


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt–Winters (level + trend + season, period m=7) of
    daily order revenue with α = β = γ = ½ — the seasonal upgrade of
    q_holt_linear, engine-exact by the same construction: every
    recurrence is an integer halving on cent-scaled bigints via
    FLOOR(expr / 2.0) (floors identically everywhere for |expr| < 2^53;
    Python's ``//`` matches),

        l_t = ⌊(x_t − s_{t−m} + l_{t−1} + b_{t−1}) / 2⌋
        b_t = ⌊(l_t − l_{t−1} + b_{t−1}) / 2⌋
        s_t = ⌊(x_t − l_t + s_{t−m}) / 2⌋

    seeded the textbook way: l_m = ⌊mean of the first cycle⌋, b_m = 0,
    s_i = x_i − l_m for i ≤ m; output starts at t = m. Season indexes
    POSITION in the observed series (mod m), the standard formulation
    on an evenly-spaced series. One-step forecast = l + b + s_{t+1−m}.

    The daily aggregation is distributed; the inherently-sequential
    triple recurrence runs as ONE Arrow task over the bounded trailing
    window (the q_exp_smooth/q_holt_linear regime). The oracle is a
    recursive CTE whose state row CARRIES the last m seasonal values
    as a list — bit-exact, including the seed.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate") >= F.lit(HOLT_START).cast("date"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("x")
        )
    )

    m = HW_PERIOD

    def hw(pdf):
        import pandas as pd

        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = pdf["x"].tolist()
        if len(xs) < m:
            return pdf.iloc[0:0].assign(l=[], b=[], s=[], f=[])
        lvl = sum(xs[:m]) // m
        trd = 0
        shist = [x - lvl for x in xs[:m]]  # s_1 .. s_m
        out = [(pdf["day"][m - 1], xs[m - 1], lvl, trd, shist[-1],
                lvl + trd + shist[0])]
        for t in range(m, len(xs)):
            x = xs[t]
            prev = lvl
            lvl = (x - shist[0] + lvl + trd) // 2
            trd = (lvl - prev + trd) // 2
            s_new = (x - lvl + shist[0]) // 2
            shist = shist[1:] + [s_new]
            out.append(
                (pdf["day"][t], x, lvl, trd, s_new, lvl + trd + shist[0])
            )
        return pd.DataFrame(
            out, columns=["day", "x", "l", "b", "s", "f"]
        ).assign(__g=1)

    sm = (
        daily.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(
            hw, "__g int, day date, x long, l long, b long, s long, f long"
        )
    )
    return sm.select(
        "day",
        (F.col("x").cast("double") / 100.0).alias("revenue"),
        (F.col("l").cast("double") / 100.0).alias("level"),
        (F.col("b").cast("double") / 100.0).alias("trend"),
        (F.col("s").cast("double") / 100.0).alias("season"),
        (F.col("f").cast("double") / 100.0).alias("forecast"),
    ).orderBy("day")


# l_t repeated in the b_t/s_t expressions (recursive members cannot
# reference sibling columns) — one template so copies cannot diverge.
_HW_L = "CAST(FLOOR((i.x - h.shist[1] + h.l + h.b) / 2.0) AS BIGINT)"
_HW_S = f"CAST(FLOOR((i.x - {_HW_L} + h.shist[1]) / 2.0) AS BIGINT)"
ORACLE["q_holt_winters"] = f"""
  WITH RECURSIVE d AS (
    SELECT o_orderdate AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders WHERE o_orderdate >= DATE '{HOLT_START}' GROUP BY 1
  ),
  idx AS (SELECT day, x, row_number() OVER (ORDER BY day) AS t FROM d),
  seed AS (
    SELECT CAST({HW_PERIOD} AS BIGINT) AS t,
           CAST(FLOOR(SUM(x) / {HW_PERIOD}.0) AS BIGINT) AS lm
    FROM idx WHERE t <= {HW_PERIOD}
  ),
  hw(t, day, x, l, b, s, shist) AS (
    SELECT i.t, i.day, i.x, seed.lm, CAST(0 AS BIGINT),
           i.x - seed.lm,
           (SELECT list(x - seed.lm ORDER BY t) FROM idx
            WHERE t <= {HW_PERIOD})
    FROM idx i, seed WHERE i.t = {HW_PERIOD}
    UNION ALL
    SELECT i.t, i.day, i.x,
           {_HW_L},
           CAST(FLOOR(({_HW_L} - h.l + h.b) / 2.0) AS BIGINT),
           {_HW_S},
           list_append(h.shist[2:], {_HW_S})
    FROM idx i JOIN hw h ON i.t = h.t + 1
  )
  SELECT day, CAST(x AS DOUBLE) / 100.0 AS revenue,
         CAST(l AS DOUBLE) / 100.0 AS level,
         CAST(b AS DOUBLE) / 100.0 AS trend,
         CAST(s AS DOUBLE) / 100.0 AS season,
         CAST(l + b + shist[1] AS DOUBLE) / 100.0 AS forecast
  FROM hw ORDER BY day
"""


# -- additive seasonal decomposition -----------------------------------------


def seasonal_over_daily(daily: DataFrame) -> DataFrame:
    """Per-day-of-week additive seasonal effects over any ``(day, x)``
    daily series (day = epoch days, x = exact scaled bigint): the
    classical decomposition's seasonal read, float-free until the last
    division. Trend is the centered 7-day moving sum over an exact
    RANGE frame (day-valued, so calendar gaps shrink the window and
    the count filter drops partial windows instead of misaligning
    them); the detrended residual 7·x − trend7 stays integer; the
    per-DOW mean closes as ONE double division of exact bigints.
    The window runs over the |days|-sized aggregate (bounded by the
    calendar — the q_anomaly_days regime), never raw rows. Shared by
    the batch query and the streaming daily-state scorer."""
    w = Window.orderBy("day").rangeBetween(-3, 3)
    t = daily.select(
        "day",
        "x",
        F.sum("x").over(w).alias("trend7"),
        F.count(F.lit(1)).over(w).alias("cnt7"),
    ).filter("cnt7 = 7")
    d = t.select(
        F.expr("(day + 4) % 7").alias("dow"),
        F.expr("7 * x - trend7").alias("d7"),
    )
    g = d.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("d7").alias("s_num"),
    )
    return g.select(
        "dow",
        "n_windows",
        "s_num",
        F.expr(
            "CAST(s_num AS DOUBLE) / (7.0 * CAST(n_windows AS DOUBLE))"
        ).alias("seasonal_fix"),
    ).orderBy("dow")


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily order revenue by day
    of week — the trend-removed weekly profile that q_weekday_uplift's
    raw per-DOW means conflate with the long-run drift (this is the
    read that justifies the Holt–Winters period choice, alongside
    q_autocorr's lag-7 spike).

    Revenue in cents (exact bigints); the portable DOW is
    (epoch_day + 4) % 7 (the q_weekday_uplift convention). Output
    keeps the exact integer numerator next to the one double division
    so the gate compares integers.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")).alias(
            "x"
        )
    )
    out = seasonal_over_daily(daily)
    return out.select(
        "dow",
        "n_windows",
        "s_num",
        F.expr("seasonal_fix / 100.0").alias("seasonal_dollars"),
    )


ORACLE["q_seasonal_decompose"] = """
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders GROUP BY 1
  ),
  t AS (
    SELECT day, x,
           CAST(SUM(x) OVER (ORDER BY day
             RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS trend7,
           COUNT(*) OVER (ORDER BY day
             RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS cnt7
    FROM daily
  ),
  d AS (
    SELECT (day + 4) % 7 AS dow, 7 * x - trend7 AS d7
    FROM t WHERE cnt7 = 7
  ),
  g AS (
    SELECT dow, COUNT(*) AS n_windows, CAST(SUM(d7) AS BIGINT) AS s_num
    FROM d GROUP BY 1
  )
  SELECT dow, n_windows, s_num,
         CAST(s_num AS DOUBLE) / (7.0 * CAST(n_windows AS DOUBLE)) / 100.0
           AS seasonal_dollars
  FROM g ORDER BY dow
"""


# -- Cochran–Armitage trend in proportions ----------------------------------

# Day-index origin for the score variable. The CA statistic and its
# variance are SHIFT-INVARIANT in the scores, so the origin changes
# nothing in the result — it only keeps the uncentered intermediate
# sums (n·t, n·t²) small enough that every product stays far inside
# DECIMAL(38)/HUGEINT and the final bigints inside 2^53 (exact double
# cast). 19723 = epoch day of 2024-01-01.
CA_EPOCH_DAY = 19723

# z closes as one shared double expression over five exact bigints,
# each < 2^53 (headroom note in ca_report). The sqrt factors are kept
# SEPARATE (r, nn−r, vt, nn) instead of one big product: the product
# r·(nn−r)·vt passes 2^53 long before any factor does, and a >2^53
# int→double cast is exactly the 1-ulp engine divergence the OLS
# module documents.
_CA_Z = (
    "CASE WHEN vt <= 0 OR r = 0 OR r = nn THEN 0.0"
    " ELSE CAST(t_n AS DOUBLE)"
    " / (sqrt(CAST(r AS DOUBLE)) * sqrt(CAST(nn - r AS DOUBLE))"
    " * sqrt(CAST(vt AS DOUBLE)) / sqrt(CAST(nn AS DOUBLE))) END"
)
_CA_CRIT = "1.959964"  # two-sided alpha = 0.05


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage test for a linear trend in the daily PURCHASE
    SHARE of the event stream — "is the conversion rate drifting?",
    the proportions complement of q_mann_kendall (which trends a
    value series, not a rate).

    With day scores t, successes r_t (purchases) and trials n_t (all
    events), T = Σ r_t·t − (R/N)·Σ n_t·t and Var(T) =
    (R/N)(1−R/N)·(Σ n_t·t² − (Σ n_t·t)²/N). Multiplying through by N
    makes both exact integers: t_n = N·Σrt − R·Σnt and
    vt = N·Σnt² − (Σnt)², so z = t_n / √(R·(N−R)·vt/N) closes as one
    shared double expression — no float accumulates over the scan.

    Scale shape: one partial-aggregated shuffle to the |days|-sized
    daily grain (three additive counters per day), then a 1-row
    aggregate. Headroom: t_n, vt < 2^53 needs N·|t|·R < 9e15 — at
    N = 1e12 trials re-center CA_EPOCH_DAY to the window start.
    """
    e = load_table(spark, sf_dir, "events")
    return ca_report(ca_daily(e))


def ca_daily(events: DataFrame) -> DataFrame:
    """Per-day (t, n, r) trials/successes — the additive CA sufficient
    state: all three columns sum across arbitrary row subsets, so a
    streaming maintainer merges per-batch outputs by day and equals
    the batch pass on any arrival order (stream_ca_trend)."""
    day = sql_epoch_day(events, "ts")
    return (
        events.select(
            F.expr(f"({day}) - {CA_EPOCH_DAY}").alias("t"),
            F.expr(
                "case when event_type = 'purchase' then 1 else 0 end"
            ).alias("is_p"),
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("is_p").alias("r"),
        )
    )


def ca_report(daily: DataFrame) -> DataFrame:
    """Close the CA test over the daily state: one 1-row power-sum
    pass, products widened through DECIMAL(38,0), then the shared
    z/verdict projection."""
    sums = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("nn"),
        F.sum("r").alias("r"),
        F.expr("sum(cast(n as decimal(38,0)) * t)").alias("st"),
        F.expr("sum(cast(n as decimal(38,0)) * t * t)").alias("stt"),
        F.expr("sum(cast(r as decimal(38,0)) * t)").alias("srt"),
    )
    v = sums.selectExpr(
        "n_days",
        "nn",
        "r",
        "cast(nn * srt - r * st as bigint) as t_n",
        "cast(nn * stt - st * st as bigint) as vt",
    )
    return v.selectExpr(
        "n_days",
        "nn as n_events",
        "r as n_purchases",
        "t_n",
        "vt",
        f"{_CA_Z} as z",
    ).selectExpr(
        "n_days",
        "n_events",
        "n_purchases",
        "t_n",
        "vt",
        "z",
        f"CASE WHEN z > {_CA_CRIT} THEN 'increasing'"
        f" WHEN z < -{_CA_CRIT} THEN 'decreasing'"
        " ELSE 'no trend' END AS trend",
    )


ORACLE["q_cochran_armitage"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
             - {CA_EPOCH_DAY} AS t,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS r
    FROM events GROUP BY 1
  ),
  sums AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS nn,
           CAST(SUM(r) AS BIGINT) AS r,
           SUM(CAST(n AS HUGEINT) * t) AS st,
           SUM(CAST(n AS HUGEINT) * t * t) AS stt,
           SUM(CAST(r AS HUGEINT) * t) AS srt
    FROM daily
  ),
  v AS (
    SELECT n_days, nn, r,
           CAST(nn * srt - r * st AS BIGINT) AS t_n,
           CAST(nn * stt - st * st AS BIGINT) AS vt
    FROM sums
  ),
  z AS (
    SELECT n_days, nn AS n_events, r AS n_purchases, t_n, vt,
           {_CA_Z} AS z
    FROM v
  )
  SELECT n_days, n_events, n_purchases, t_n, vt, z,
         CASE WHEN z > {_CA_CRIT} THEN 'increasing'
              WHEN z < -{_CA_CRIT} THEN 'decreasing'
              ELSE 'no trend' END AS trend
  FROM z
"""


# -- grouped discount-response (promotional elasticity) ---------------------


def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS fit of line quantity against discount depth —
    the "does a deeper discount move more units?" promotional-lift
    read, and the grouped-regression shape q_ols_trend doesn't show:
    here the regressor is a measured column (discount in basis
    points), not time, and one aggregate pass fits all |brands|
    models simultaneously — the fit-a-million-tiny-models-in-one-scan
    pattern that matters at warehouse scale.

    x = discount in exact basis points (0..1000), y = quantity in
    exact centi-units; the sufficient statistics reuse q_ols_trend's
    exact-integer names/widths so the SAME closing formulas
    (_ols_formulas — slope/intercept/R² as scaled integer ratios, one
    double cast each) close the fit, re-labeled to this axis pair:
    slope_qty_per_bp = units moved per extra basis point.

    Scale shape: lineitem joins broadcast(part) (brand lives on the
    part row — no fact-side shuffle), then ONE partial-aggregated
    groupBy(brand) whose shuffle carries |brands| rows of six
    counters. x ≤ 10⁴ keeps st/stt bigint-exact to ~10¹⁰ lines per
    brand; y-sums widen through DECIMAL(27) like ols_report.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.expr("cast(floor(l_discount * 10000 + 0.5) as bigint)").alias(
                "x"
            ),
            F.expr("cast(floor(l_quantity * 100 + 0.5) as bigint)").alias(
                "y"
            ),
        )
    )
    sums = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("st"),
        F.expr("sum(x * x)").alias("stt"),
        F.expr("sum(cast(y as decimal(27,0)))").alias("sy"),
        F.expr("sum(cast(x as decimal(27,0)) * y)").alias("sty"),
        F.expr("sum(cast(y as decimal(27,0)) * y)").alias("syy"),
    )
    fm = _ols_formulas("div", "DECIMAL(38,0)")
    return sums.selectExpr(
        "p_brand",
        "n as n_lines",
        f"{fm['slope_dollars_per_day']} AS slope_qty_per_bp",
        f"{fm['intercept_dollars']} AS intercept_qty",
        f"{fm['r2']} AS r2",
    ).orderBy("p_brand")


def _de_oracle() -> str:
    fm = _ols_formulas("//", "HUGEINT")
    return f"""
  WITH base AS (
    SELECT p_brand,
           CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS x,
           CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS y
    FROM lineitem JOIN part ON l_partkey = p_partkey
  ),
  sums AS (
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(x) AS BIGINT) AS st,
           CAST(SUM(x * x) AS BIGINT) AS stt,
           SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(x AS HUGEINT) * y) AS sty,
           SUM(CAST(y AS HUGEINT) * y) AS syy
    FROM base GROUP BY 1
  )
  SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
         {fm["slope_dollars_per_day"]} AS slope_qty_per_bp,
         {fm["intercept_dollars"]} AS intercept_qty,
         {fm["r2"]} AS r2
  FROM sums ORDER BY p_brand
"""


ORACLE["q_discount_elasticity"] = _de_oracle()


# -- categorical composition drift ------------------------------------------


def q_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order-priority MIX drift against the lifetime mix —
    the categorical composition monitor (did the workload's shape
    change, not just its volume): per month, a chi-square-style ppm
    divergence between the month's priority shares and the global
    shares, the q_benford deviation device pointed at time buckets.
    t_freq_drift does this for token frequencies between corpus
    halves; this is the relational twin over calendar months.

    Scale shape: ONE partial-aggregated scan to the |months ×
    priorities| cell grid (bounded by the calendar × a 5-value
    domain — metadata, not data); zero-count cells are restored via
    the grid LEFT JOIN (the q_kendall_tau device) because a missing
    cell is maximal drift evidence, not missing data. All shares are
    exact ppm floor divisions through DECIMAL(20) products; the
    divergence terms are pure bigint.
    """
    o = load_table(spark, sf_dir, "orders")
    return mix_report(mix_cells(o))


def mix_cells(orders: DataFrame) -> DataFrame:
    """The additive |months × priorities| cell state — per-batch
    counts merge by key (commutative monoid), so a streaming
    maintainer equals the batch pass on any arrival order
    (stream_mix_drift)."""
    base = orders.select(
        F.expr(
            "cast(year(o_orderdate) * 12 + month(o_orderdate) as bigint)"
        ).alias("m"),
        F.col("o_orderpriority").alias("pri"),
    )
    return base.groupBy("m", "pri").agg(F.count(F.lit(1)).alias("c"))


def mix_report(cells: DataFrame) -> DataFrame:
    """Close the drift report over the bounded cell state: restore
    zero cells via the grid, then exact ppm chi-square terms."""
    grid = (
        cells.select("m")
        .distinct()
        .crossJoin(F.broadcast(cells.select("pri").distinct()))
        .join(cells, ["m", "pri"], "left")
        .select("m", "pri", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    tot_m = cells.groupBy("m").agg(F.sum("c").alias("t"))
    glob = cells.groupBy("pri").agg(F.sum("c").alias("ni"))
    nn = cells.agg(F.sum("c").alias("nn"))
    scored = (
        grid.join(tot_m, "m")
        .join(F.broadcast(glob), "pri")
        .crossJoin(F.broadcast(nn))
        .select(
            "m",
            "t",
            F.expr(
                "cast(cast(c as decimal(20,0)) * 1000000 div t as bigint)"
            ).alias("obs_ppm"),
            F.expr(
                "cast(cast(ni as decimal(20,0)) * 1000000 div nn as bigint)"
            ).alias("exp_ppm"),
        )
        .withColumn(
            # Clamp the denominator: a priority whose global share
            # floors to 0 ppm would otherwise NULL its term and SUM
            # would silently drop the strongest drift evidence.
            "dev",
            F.expr(
                "(obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)"
                " div greatest(exp_ppm, 1)"
            ),
        )
    )
    return (
        scored.groupBy(F.col("m").alias("month_idx"))
        .agg(
            F.max("t").alias("n_orders"),
            F.sum("dev").alias("chi2_ppm"),
        )
        .orderBy("month_idx")
    )


ORACLE["q_mix_drift"] = """
  WITH base AS (
    SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
             AS m,
           o_orderpriority AS pri
    FROM orders
  ),
  cells AS (SELECT m, pri, COUNT(*) AS c FROM base GROUP BY 1, 2),
  grid AS (
    SELECT ms.m, ps.pri, COALESCE(c.c, 0) AS c
    FROM (SELECT DISTINCT m FROM cells) ms
    CROSS JOIN (SELECT DISTINCT pri FROM cells) ps
    LEFT JOIN cells c USING (m, pri)
  ),
  tot_m AS (SELECT m, CAST(SUM(c) AS BIGINT) AS t FROM cells GROUP BY 1),
  gpri AS (SELECT pri, CAST(SUM(c) AS BIGINT) AS ni FROM cells GROUP BY 1),
  nn AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM cells),
  scored AS (
    SELECT m, t,
           CAST(CAST(c AS HUGEINT) * 1000000 // t AS BIGINT) AS obs_ppm,
           CAST(CAST(ni AS HUGEINT) * 1000000 // nn AS BIGINT) AS exp_ppm
    FROM grid JOIN tot_m USING (m) JOIN gpri USING (pri) CROSS JOIN nn
  )
  SELECT m AS month_idx, CAST(MAX(t) AS BIGINT) AS n_orders,
         CAST(SUM((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)
                  // GREATEST(exp_ppm, 1))
              AS BIGINT) AS chi2_ppm
  FROM scored GROUP BY 1 ORDER BY month_idx
"""


# -- McNemar paired year-over-year activity test --------------------------------------

MCN_Y1 = 1997
MCN_Y2 = 1998


def mcnemar_state(orders: DataFrame) -> DataFrame:
    """The per-customer paired-activity state ``(o_custkey, in1,
    in2)``: did the customer order in {MCN_Y1} / in {MCN_Y2}? Each
    flag is an OR monoid (MAX over 0/1 — late or re-delivered chunks
    can only turn a 0 into a 1, so any batching/arrival order
    reproduces the batch flags); |customers| rows forever. Shared by
    ``q_mcnemar`` and ``streaming.stateful.stream_mcnemar``."""
    return (
        orders.filter(
            f"year(o_orderdate) IN ({MCN_Y1}, {MCN_Y2})"
        )
        .groupBy("o_custkey")
        .agg(
            F.max(
                F.expr(f"cast(year(o_orderdate) = {MCN_Y1} as int)")
            ).alias("in1"),
            F.max(
                F.expr(f"cast(year(o_orderdate) = {MCN_Y2} as int)")
            ).alias("in2"),
        )
    )


def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired test of year-over-year customer activity: among
    customers active in {MCN_Y1} or {MCN_Y2}, are the DISCORDANT
    counts (active-then-gone b vs gone-then-active c) balanced? The
    churn-vs-acquisition significance read a retention review wants
    before celebrating a flat active-customer count — the PAIRED
    complement of q_new_vs_returning (same customers, matched across
    years, so between-customer variance cancels).

    Scale shape: all data-sized work is the ONE partial-aggregated
    groupBy of ``mcnemar_state`` down to |customers| flag pairs (both
    flags OR monoids — the state stream_mcnemar maintains live), then
    ONE count-aggregate to the four cells. Exactness: χ² =
    (b−c)²/(b+c) closes as an exact ppm floor division plus ONE
    byte-identical double; the continuity-corrected variant
    (|b−c|−1)²/(b+c) is emitted alongside (the small-count default).

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    return mcnemar_report(mcnemar_state(load_table(spark, sf_dir, "orders")))


def mcnemar_report(state: DataFrame) -> DataFrame:
    """Close the 2x2 paired panel over any (o_custkey, in1, in2)
    flag state."""
    return state.agg(
        F.sum(F.expr("in1 * in2")).alias("n_both"),
        F.sum(F.expr("in1 * (1 - in2)")).alias("b_lost"),
        F.sum(F.expr("(1 - in1) * in2")).alias("c_gained"),
    ).selectExpr(
        "n_both",
        "b_lost",
        "c_gained",
        "cast(b_lost - c_gained as decimal(38,0))"
        " * (b_lost - c_gained) * 1000000"
        " div greatest(b_lost + c_gained, 1) AS chi2_ppm",
        "CASE WHEN b_lost + c_gained > 0 THEN"
        " CAST((abs(b_lost - c_gained) - 1)"
        " * (abs(b_lost - c_gained) - 1) AS DOUBLE)"
        " / CAST(b_lost + c_gained AS DOUBLE)"
        " ELSE NULL END AS chi2_corrected",
    )


ORACLE["q_mcnemar"] = f"""
  WITH state AS (
    SELECT o_custkey,
           MAX(CAST(year(CAST(o_orderdate AS DATE)) = {MCN_Y1} AS INT))
             AS in1,
           MAX(CAST(year(CAST(o_orderdate AS DATE)) = {MCN_Y2} AS INT))
             AS in2
    FROM orders
    WHERE year(CAST(o_orderdate AS DATE)) IN ({MCN_Y1}, {MCN_Y2})
    GROUP BY 1
  ),
  agg AS (
    SELECT CAST(SUM(in1 * in2) AS BIGINT) AS n_both,
           CAST(SUM(in1 * (1 - in2)) AS BIGINT) AS b_lost,
           CAST(SUM((1 - in1) * in2) AS BIGINT) AS c_gained
    FROM state
  )
  SELECT n_both, b_lost, c_gained,
         CAST(CAST(b_lost - c_gained AS HUGEINT)
              * (b_lost - c_gained) * 1000000
              // GREATEST(b_lost + c_gained, 1) AS BIGINT) AS chi2_ppm,
         CASE WHEN b_lost + c_gained > 0 THEN
           CAST((ABS(b_lost - c_gained) - 1)
                * (ABS(b_lost - c_gained) - 1) AS DOUBLE)
           / CAST(b_lost + c_gained AS DOUBLE)
         ELSE NULL END AS chi2_corrected
  FROM agg
"""


# -- difference-in-differences -----------------------------------------------------

DID_CUT_YEAR = 1998  # post-period starts here


def q_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: did PROMO parts' average revenue
    per line move differently across the {DID_CUT_YEAR} cut than
    everyone else's? The workhorse causal panel — the control group's
    pre→post drift nets out market-wide trends, so what remains is
    the treatment-specific effect a promo-policy review actually
    wants (q_discount_elasticity reads a cross-sectional slope; this
    reads a before/after experiment).

    Scale shape: ONE fact-dim equi-join tags each line with its
    treatment flag (part dim projected to two columns — broadcast
    at any realistic |part|/executor-memory ratio), ONE
    partial-aggregated groupBy down to the FOUR (treat, post) cells,
    then a row-local pivot of the 4-row table into the panel.
    Exactness: cell means are exact micro-cent floor divisions
    (Σcents·10⁶ div n) and the DiD is plain integer arithmetic over
    the four floors — byte-identical on both engines.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's causal family.
    """
    return did_report(
        did_state(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "part"),
        )
    )


def did_state(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """The FOUR-cell (treat, post) DiD grid: line count + exact
    revenue cents per cell — both plain-sum monoids (late chunks add
    in; the grid is 4 rows forever). Shared by ``q_did`` and
    ``streaming.stateful.stream_did``."""
    tagged = lineitem.join(
        part.selectExpr(
            "p_partkey",
            "cast(p_type LIKE 'PROMO%' as int) AS treat",
        ),
        lineitem["l_partkey"] == F.col("p_partkey"),
    ).select(
        "treat",
        F.expr(
            f"cast(year(l_shipdate) >= {DID_CUT_YEAR} as int)"
        ).alias("post"),
        F.expr(
            f"cast(floor(l_extendedprice * {SCALE} + 0.5) as bigint)"
        ).alias("c"),
    )
    return tagged.groupBy("treat", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
    )


def did_report(state: DataFrame) -> DataFrame:
    """Close the DiD panel over any (treat, post, n, s) cell grid."""
    cells = state.selectExpr(
        "treat",
        "post",
        "n",
        "cast(s as decimal(38,0)) * 1000000 div n AS mean_uc",
    )
    return cells.agg(
        F.max(F.expr("case when treat = 1 and post = 0 then n end"))
        .alias("n_treat_pre"),
        F.max(F.expr("case when treat = 1 and post = 1 then n end"))
        .alias("n_treat_post"),
        F.max(F.expr("case when treat = 0 and post = 0 then n end"))
        .alias("n_ctrl_pre"),
        F.max(F.expr("case when treat = 0 and post = 1 then n end"))
        .alias("n_ctrl_post"),
        F.max(F.expr("case when treat = 1 and post = 0 then mean_uc end"))
        .alias("treat_pre_uc"),
        F.max(F.expr("case when treat = 1 and post = 1 then mean_uc end"))
        .alias("treat_post_uc"),
        F.max(F.expr("case when treat = 0 and post = 0 then mean_uc end"))
        .alias("ctrl_pre_uc"),
        F.max(F.expr("case when treat = 0 and post = 1 then mean_uc end"))
        .alias("ctrl_post_uc"),
    ).selectExpr(
        "n_treat_pre", "n_treat_post", "n_ctrl_pre", "n_ctrl_post",
        "treat_pre_uc", "treat_post_uc", "ctrl_pre_uc", "ctrl_post_uc",
        "(treat_post_uc - treat_pre_uc) - (ctrl_post_uc - ctrl_pre_uc)"
        " AS did_uc",
    )


ORACLE["q_did"] = f"""
  WITH cells AS (
    SELECT CAST(p_type LIKE 'PROMO%' AS INT) AS treat,
           CAST(year(CAST(l_shipdate AS DATE)) >= {DID_CUT_YEAR} AS INT)
             AS post,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * {SCALE} + 0.5) AS BIGINT))
                * 1000000 // COUNT(*) AS BIGINT) AS mean_uc
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
  )
  SELECT
    MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_treat_pre,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_treat_post,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_ctrl_pre,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_ctrl_post,
    MAX(CASE WHEN treat = 1 AND post = 0 THEN mean_uc END)
      AS treat_pre_uc,
    MAX(CASE WHEN treat = 1 AND post = 1 THEN mean_uc END)
      AS treat_post_uc,
    MAX(CASE WHEN treat = 0 AND post = 0 THEN mean_uc END)
      AS ctrl_pre_uc,
    MAX(CASE WHEN treat = 0 AND post = 1 THEN mean_uc END)
      AS ctrl_post_uc,
    (MAX(CASE WHEN treat = 1 AND post = 1 THEN mean_uc END)
     - MAX(CASE WHEN treat = 1 AND post = 0 THEN mean_uc END))
    - (MAX(CASE WHEN treat = 0 AND post = 1 THEN mean_uc END)
       - MAX(CASE WHEN treat = 0 AND post = 0 THEN mean_uc END))
      AS did_uc
  FROM cells
"""


# -- capture-recapture population estimate -------------------------------------------


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture–recapture estimate of the reachable customer
    population: treating {MCN_Y1} actives as the first capture and
    {MCN_Y2} actives as the second, Lincoln–Petersen N̂ = n1·n2/m
    (with Chapman's small-m correction) estimates how many customers
    are OUT there — including those seen in neither year — and the
    coverage ratio says what fraction the two years actually touched.
    The ecology estimator turned data-quality read: SECOND finisher on
    the shared ``mcnemar_state`` flag pairs (one state: a paired
    significance test AND a population estimate).

    Exactness: n1, n2, and the recaptured overlap m are plain integer
    sums off the OR-monoid flags; both estimators and the coverage
    ratio close as exact floor divisions (Chapman: ⌊(n1+1)(n2+1)/
    (m+1)⌋ − 1, unbiased for m ≥ 0 — products widen through
    DECIMAL(38)/HUGEINT for 1e12-customer safety).

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's estimation family.
    """
    return capture_report(
        mcnemar_state(load_table(spark, sf_dir, "orders"))
    )


def capture_report(state: DataFrame) -> DataFrame:
    """Close the capture-recapture panel over any (o_custkey, in1,
    in2) flag state."""
    return state.agg(
        F.sum("in1").alias("n1"),
        F.sum("in2").alias("n2"),
        F.sum(F.expr("in1 * in2")).alias("m"),
    ).selectExpr(
        "n1",
        "n2",
        "m",
        "n1 + n2 - m AS observed",
        "CAST(n1 AS DECIMAL(38,0)) * n2 div greatest(m, 1) AS lp_est",
        "CAST(n1 + 1 AS DECIMAL(38,0)) * (n2 + 1) div (m + 1) - 1"
        " AS chapman_est",
        "(n1 + n2 - m) * 1000000"
        " div greatest(CAST(n1 AS DECIMAL(38,0)) * n2"
        " div greatest(m, 1), 1) AS coverage_ppm",
    )


ORACLE["q_capture_recapture"] = f"""
  WITH state AS (
    SELECT o_custkey,
           MAX(CAST(year(CAST(o_orderdate AS DATE)) = {MCN_Y1} AS INT))
             AS in1,
           MAX(CAST(year(CAST(o_orderdate AS DATE)) = {MCN_Y2} AS INT))
             AS in2
    FROM orders
    WHERE year(CAST(o_orderdate AS DATE)) IN ({MCN_Y1}, {MCN_Y2})
    GROUP BY 1
  ),
  agg AS (
    SELECT CAST(SUM(in1) AS BIGINT) AS n1,
           CAST(SUM(in2) AS BIGINT) AS n2,
           CAST(SUM(in1 * in2) AS BIGINT) AS m
    FROM state
  )
  SELECT n1, n2, m,
         n1 + n2 - m AS observed,
         CAST(CAST(n1 AS HUGEINT) * n2 // GREATEST(m, 1) AS BIGINT)
           AS lp_est,
         CAST(CAST(n1 + 1 AS HUGEINT) * (n2 + 1) // (m + 1) - 1
              AS BIGINT) AS chapman_est,
         CAST((n1 + n2 - m) * 1000000
              // GREATEST(CAST(n1 AS HUGEINT) * n2 // GREATEST(m, 1), 1)
              AS BIGINT) AS coverage_ppm
  FROM agg
"""


# -- CUPED variance-reduced experiment readout --------------------------------------

CUPED_PRE_Y = 1997   # pre-period covariate year
CUPED_POST_Y = 1998  # experiment (post) year


def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B readout of customer revenue: the post-period
    treatment/control revenue difference with each customer's
    PRE-period revenue regressed out (θ = cov(pre, post)/var(pre),
    adjusted post = post − θ·(pre − mean(pre))) — the standard
    variance-reduction device that makes an experiment readable at a
    fraction of the sample, and the natural third panel next to
    q_ab_test (raw proportions) and q_did (trend netting).  Variant =
    ``c_custkey % 2`` (the q_ab_test split convention).

    Exactness: the per-customer (treat, pre, post) cent grid is the
    state (both sums plain-add monoids keyed by customer —
    ``stream_cuped`` maintains it live); θ closes as ONE double
    division of two exact DECIMAL(38)/HUGEINT cross-moment integers
    (N·Σxy − Σx·Σy over N·Σx² − Σx·Σx), and the adjusted difference
    and variance-reduction ratio are fixed-order double expressions
    over exact integers — byte-identical on both engines.

    Scale shape: ONE filtered scan of orders, ONE partial-aggregated
    groupBy to |customers with a pre/post order| rows, ONE 1-row
    moment aggregate.  No windows, no joins.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's causal family.
    """
    return cuped_report(cuped_state(load_table(spark, sf_dir, "orders")))


def cuped_grid(orders: DataFrame) -> DataFrame:
    """The KEYED per-customer (o_custkey, pre_c, post_c) cent grid
    over the two experiment years — per-key plain-sum monoids (late
    chunks add in; ``stream_cuped`` merges per-batch grids by
    customer)."""
    return (
        orders.filter(
            F.expr(
                f"year(o_orderdate) IN ({CUPED_PRE_Y}, {CUPED_POST_Y})"
            )
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr(
                    f"cast(case when year(o_orderdate) = {CUPED_PRE_Y}"
                    f" then floor(o_totalprice * {SCALE} + 0.5)"
                    " else 0 end as bigint)"
                )
            ).alias("pre_c"),
            F.sum(
                F.expr(
                    f"cast(case when year(o_orderdate) = {CUPED_POST_Y}"
                    f" then floor(o_totalprice * {SCALE} + 0.5)"
                    " else 0 end as bigint)"
                )
            ).alias("post_c"),
        )
    )


def cuped_state(orders: DataFrame) -> DataFrame:
    """The (treat, pre_c, post_c) projection of ``cuped_grid`` the
    report closes over (treat = custkey % 2, the q_ab_test split)."""
    return cuped_treat(cuped_grid(orders))


def cuped_treat(grid: DataFrame) -> DataFrame:
    """Row-local treat projection over any keyed customer grid."""
    return grid.select(
        F.expr("cast(o_custkey % 2 as int)").alias("treat"),
        "pre_c",
        "post_c",
    )


def cuped_report(state: DataFrame) -> DataFrame:
    """Close the CUPED panel over any (treat, pre_c, post_c) grid.
    Degenerate grids (one arm empty, or zero pre-period variance —
    possible mid-stream, never on the gated tables) yield NULL
    ratios, not an ANSI divide-by-zero crash."""
    agg = state.agg(
        F.sum(F.expr("cast(treat = 0 as bigint)")).alias("n0"),
        F.sum(F.expr("cast(treat = 1 as bigint)")).alias("n1"),
        F.sum(F.expr("case when treat = 0 then pre_c else 0 end")).alias("pre0_c"),
        F.sum(F.expr("case when treat = 1 then pre_c else 0 end")).alias("pre1_c"),
        F.sum(F.expr("case when treat = 0 then post_c else 0 end")).alias("post0_c"),
        F.sum(F.expr("case when treat = 1 then post_c else 0 end")).alias("post1_c"),
        F.sum(F.expr("cast(pre_c as decimal(38,0)) * pre_c")).alias("sp2"),
        F.sum(F.expr("cast(pre_c as decimal(38,0)) * post_c")).alias("spp"),
        F.sum(F.expr("cast(post_c as decimal(38,0)) * post_c")).alias("so2"),
    )
    # exact integer cross-moments first (DECIMAL(38)/HUGEINT), then θ
    # as ONE double division and fixed-order double arithmetic after
    mid = agg.selectExpr(
        "n0", "n1", "pre0_c", "pre1_c", "post0_c", "post1_c",
        "spp * (n0 + n1)"
        " - CAST(pre0_c + pre1_c AS DECIMAL(38,0)) * (post0_c + post1_c)"
        " AS cov_n",
        "sp2 * (n0 + n1)"
        " - CAST(pre0_c + pre1_c AS DECIMAL(38,0)) * (pre0_c + pre1_c)"
        " AS varp_n",
        "so2 * (n0 + n1)"
        " - CAST(post0_c + post1_c AS DECIMAL(38,0)) * (post0_c + post1_c)"
        " AS varo_n",
    )
    return mid.selectExpr(
        "n0", "n1", "pre0_c", "pre1_c", "post0_c", "post1_c",
        "CASE WHEN n0 = 0 OR n1 = 0 OR varp_n = 0 THEN NULL ELSE"
        " CAST(cov_n AS DOUBLE) / CAST(varp_n AS DOUBLE) END AS theta",
        "CASE WHEN n0 = 0 OR n1 = 0 THEN NULL ELSE"
        " CAST(post1_c AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(post0_c AS DOUBLE) / CAST(n0 AS DOUBLE) END AS raw_diff",
        "CASE WHEN n0 = 0 OR n1 = 0 OR varp_n = 0 THEN NULL ELSE"
        " (CAST(post1_c AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(post0_c AS DOUBLE) / CAST(n0 AS DOUBLE))"
        " - (CAST(cov_n AS DOUBLE) / CAST(varp_n AS DOUBLE))"
        " * (CAST(pre1_c AS DOUBLE) / CAST(n1 AS DOUBLE)"
        " - CAST(pre0_c AS DOUBLE) / CAST(n0 AS DOUBLE)) END AS cuped_diff",
        "CASE WHEN varp_n = 0 OR varo_n = 0 THEN NULL ELSE"
        " (CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE))"
        " / (CAST(varp_n AS DOUBLE) * CAST(varo_n AS DOUBLE))"
        " END AS var_reduction",
    )


ORACLE["q_cuped"] = f"""
  WITH state AS (
    SELECT o_custkey % 2 AS treat,
           CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = {CUPED_PRE_Y}
                    THEN CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS pre_c,
           CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = {CUPED_POST_Y}
                    THEN CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS post_c
    FROM orders
    WHERE year(CAST(o_orderdate AS DATE)) IN ({CUPED_PRE_Y}, {CUPED_POST_Y})
    GROUP BY o_custkey
  ),
  agg AS (
    SELECT CAST(SUM(CAST(treat = 0 AS BIGINT)) AS BIGINT) AS n0,
           CAST(SUM(CAST(treat = 1 AS BIGINT)) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN treat = 0 THEN pre_c ELSE 0 END) AS BIGINT) AS pre0_c,
           CAST(SUM(CASE WHEN treat = 1 THEN pre_c ELSE 0 END) AS BIGINT) AS pre1_c,
           CAST(SUM(CASE WHEN treat = 0 THEN post_c ELSE 0 END) AS BIGINT) AS post0_c,
           CAST(SUM(CASE WHEN treat = 1 THEN post_c ELSE 0 END) AS BIGINT) AS post1_c,
           SUM(CAST(pre_c AS HUGEINT) * pre_c) AS sp2,
           SUM(CAST(pre_c AS HUGEINT) * post_c) AS spp,
           SUM(CAST(post_c AS HUGEINT) * post_c) AS so2
    FROM state
  ),
  mid AS (
    SELECT n0, n1, pre0_c, pre1_c, post0_c, post1_c,
           spp * (n0 + n1)
             - CAST(pre0_c + pre1_c AS HUGEINT) * (post0_c + post1_c)
             AS cov_n,
           sp2 * (n0 + n1)
             - CAST(pre0_c + pre1_c AS HUGEINT) * (pre0_c + pre1_c)
             AS varp_n,
           so2 * (n0 + n1)
             - CAST(post0_c + post1_c AS HUGEINT) * (post0_c + post1_c)
             AS varo_n
    FROM agg
  )
  SELECT n0, n1, pre0_c, pre1_c, post0_c, post1_c,
         CASE WHEN n0 = 0 OR n1 = 0 OR varp_n = 0 THEN NULL ELSE
           CAST(cov_n AS DOUBLE) / CAST(varp_n AS DOUBLE) END AS theta,
         CASE WHEN n0 = 0 OR n1 = 0 THEN NULL ELSE
           CAST(post1_c AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(post0_c AS DOUBLE) / CAST(n0 AS DOUBLE) END AS raw_diff,
         CASE WHEN n0 = 0 OR n1 = 0 OR varp_n = 0 THEN NULL ELSE
           (CAST(post1_c AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(post0_c AS DOUBLE) / CAST(n0 AS DOUBLE))
           - (CAST(cov_n AS DOUBLE) / CAST(varp_n AS DOUBLE))
           * (CAST(pre1_c AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(pre0_c AS DOUBLE) / CAST(n0 AS DOUBLE)) END AS cuped_diff,
         CASE WHEN varp_n = 0 OR varo_n = 0 THEN NULL ELSE
           (CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE))
           / (CAST(varp_n AS DOUBLE) * CAST(varo_n AS DOUBLE))
           END AS var_reduction
  FROM mid
"""


# -- sequential probability ratio test (SPRT) ---------------------------------------

# Wald SPRT design constants: H0 p=0.15 vs H1 p=0.25 daily purchase
# conversion, α = β = 0.05.  The per-observation log-likelihood
# increments and the decision bounds are EMBEDDED as integer-ppb
# literals (math.log evaluated once, offline) so NEITHER engine calls
# a log function — cumulative LLR stays exact integer arithmetic.
SPRT_A_PPB = 510825624        # round(1e9·ln(p1/p0)) per conversion
SPRT_B_PPB = -125163143       # round(1e9·ln((1−p1)/(1−p0))) per miss
SPRT_UP_PPB = 2944438979      # round(1e9·ln((1−β)/α)) → accept H1
SPRT_DN_PPB = -2944438979     # round(1e9·ln(β/(1−α))) → accept H0


def q_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald sequential probability ratio test over the experiment
    variant's daily purchase conversion — the always-valid sequential
    monitor that says, day by day, whether the evidence has crossed
    the accept-H1 / accept-H0 boundary or the test must continue: the
    peeking-safe companion to q_ab_test's fixed-horizon z (peeking at
    a z-test inflates false positives; the SPRT's thresholds are
    valid at EVERY look).

    Exactness: the state is the per-(day, user) activity grid of the
    variant-1 arm with an OR-monoid converted flag (idempotent —
    ``stream_sprt`` maintains it live); daily (n, x) counts collapse
    from the grid, each day's LLR increment x·A + (n−x)·B is exact
    integer ppb (A, B literal constants), and the cumulative LLR is
    one range-partitioned prefix sum over the |days|-bounded
    aggregate (operators.ranking.global_running_sum — no
    one-partition window).  The decision column is a pure integer
    comparison against the literal Wald bounds.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's experimentation family.
    """
    return sprt_report(sprt_state(load_table(spark, sf_dir, "events")))


def sprt_state(events: DataFrame) -> DataFrame:
    """The per-(day, user) variant-1 activity grid with converted
    flag — an idempotent (SET, OR) monoid bounded by |users × days|.
    Shared by ``q_sprt`` and ``streaming.stateful.stream_sprt``."""
    day = sql_epoch_day(events, "ts")
    return (
        events.filter("user_id % 2 = 1")
        .select(
            F.expr(f"cast({day} as int)").alias("day"),
            "user_id",
            F.expr("cast(event_type = 'purchase' as int)").alias("conv"),
        )
        .groupBy("day", "user_id")
        .agg(F.max("conv").alias("conv"))
    )


def sprt_report(grid: DataFrame) -> DataFrame:
    """Close the sequential monitor over any (day, user_id, conv)
    activity grid."""
    from locopy_spark.operators.ranking import global_running_sum

    daily = grid.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_conv"),
    ).select(
        "day",
        "n_users",
        "n_conv",
        F.expr(
            f"n_conv * {SPRT_A_PPB} + (n_users - n_conv)"
            f" * cast({SPRT_B_PPB} as bigint)"
        ).alias("llr_ppb"),
    )
    # bounded arm (r12): the daily monitor grid is |days|-sized at any
    # volume.
    cum = global_running_sum(
        daily, order_cols=["day"], value_col="llr_ppb", out_col="pre",
        bounded=True,
    )
    return (
        cum.select(
            "day",
            "n_users",
            "n_conv",
            "llr_ppb",
            F.expr("pre + llr_ppb").alias("cum_llr_ppb"),
        )
        .selectExpr(
            "day",
            "n_users",
            "n_conv",
            "llr_ppb",
            "cum_llr_ppb",
            f"CASE WHEN cum_llr_ppb >= {SPRT_UP_PPB} THEN 'accept_h1'"
            f" WHEN cum_llr_ppb <= {SPRT_DN_PPB} THEN 'accept_h0'"
            " ELSE 'continue' END AS decision",
        )
        .orderBy("day")
    )


ORACLE["q_sprt"] = f"""
  WITH grid AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
           user_id,
           MAX(CAST(event_type = 'purchase' AS INT)) AS conv
    FROM events WHERE user_id % 2 = 1
    GROUP BY 1, 2
  ),
  daily AS (
    SELECT day, COUNT(*) AS n_users,
           CAST(SUM(conv) AS BIGINT) AS n_conv
    FROM grid GROUP BY 1
  ),
  scored AS (
    SELECT day, n_users, n_conv,
           n_conv * {SPRT_A_PPB}
             + (n_users - n_conv) * CAST({SPRT_B_PPB} AS BIGINT) AS llr_ppb
    FROM daily
  ),
  cum AS (
    SELECT day, n_users, n_conv, llr_ppb,
           CAST(SUM(llr_ppb) OVER (
             ORDER BY day ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_llr_ppb
    FROM scored
  )
  SELECT day, CAST(n_users AS BIGINT) AS n_users, n_conv, llr_ppb,
         cum_llr_ppb,
         CASE WHEN cum_llr_ppb >= {SPRT_UP_PPB} THEN 'accept_h1'
              WHEN cum_llr_ppb <= {SPRT_DN_PPB} THEN 'accept_h0'
              ELSE 'continue' END AS decision
  FROM cum ORDER BY day
"""
