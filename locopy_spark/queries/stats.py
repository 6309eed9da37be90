"""Statistical / data-quality queries: exact correlation and
column profiling.

What locopy users run right after a COPY lands (reference:
locopy/redshift.py:235 loads, validation left to user SQL): sanity
profiles and relationship checks, expressed Spark-first.

Determinism: correlation runs on DECIMAL(38) integer power sums
(overflow-safe at any SF) with the final formula in double using
byte-identical expression text on both engines — the
``q_stats_moments`` scheme extended to cross moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locopy_spark.functions.numeric import SCALE, sql_epoch_us
from locopy_spark.sources.tables import load_table

# Pearson r and sample covariance written ONCE, formatted for each
# engine: every operand is an exact integer (bigint n, decimal/hugeint
# power sums) cast to double at the same points, so the IEEE result is
# bit-identical.
# Zero-variance input (a constant column — possible mid-stream) or a
# single observation zeroes a denominator: NULL, not an ANSI
# divide-by-zero crash.  Guarded at the TEMPLATE level so every call
# site (Pearson, autocorr, brand xcorr) and both engines agree.
_CORR = (
    "CASE WHEN {n} <= 1"
    " OR ({n} * CAST({sx2} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE)) <= 0.0"
    " OR ({n} * CAST({sy2} AS DOUBLE) - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE)) <= 0.0"
    " THEN CAST(NULL AS DOUBLE) ELSE"
    " ({n} * CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
    " / (sqrt({n} * CAST({sx2} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
    " * sqrt({n} * CAST({sy2} AS DOUBLE) - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE))) END"
)
_COV = (
    "CASE WHEN {n} <= 1 THEN CAST(NULL AS DOUBLE) ELSE"
    " (CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE) / {n})"
    " / ({n} - 1) END"
)


def q_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation + sample covariance of quantity vs
    extended price per return flag.

    One partial-aggregated shuffle carrying five DECIMAL(38) power
    sums per group — the mergeable-moments shape that computes any
    second-order statistic (corr/cov/stddev) over 100 TB in a single
    pass. Built-in ``corr()`` is a running double accumulation
    (partition-order dependent, can never hash-match an oracle);
    integer power sums are exact and associative.
    """
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        "l_returnflag",
        F.expr(
            f"cast(floor(l_quantity * {SCALE} + 0.5) as bigint)"
        ).alias("x"),
        F.expr(
            f"cast(floor(l_extendedprice * {SCALE} + 0.5) as bigint)"
        ).alias("y"),
    )
    agg = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("cast(x as decimal(38,0))")).alias("sx"),
        F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
        F.sum(F.expr("cast(x * y as decimal(38,0))")).alias("sxy"),
        F.sum(F.expr("cast(x * x as decimal(38,0))")).alias("sx2"),
        F.sum(F.expr("cast(y * y as decimal(38,0))")).alias("sy2"),
    )
    fmt = dict(n="n", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2")
    return (
        agg.select(
            "l_returnflag",
            "n",
            F.expr(_CORR.format(**fmt)).alias("corr_qty_price"),
            F.expr(_COV.format(**fmt)).alias("cov_scaled"),
        )
        .orderBy("l_returnflag")
    )


# (column, kind) pairs profiled over orders; kind drives which min/max
# slot is populated: numeric → double, string → lexicographic string,
# ts → epoch microseconds as double
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_totalprice", "num"),
    ("o_orderstatus", "str"),
    ("o_orderpriority", "str"),
    ("o_orderdate", "ts"),
]


def q_profile_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile summary of orders: per column, null count, exact
    distinct count, and typed min/max — the post-COPY validation scan.

    Two aggregates over one table: the multi-column exact distinct
    runs ALONE (Catalyst's Expand + hash aggregate — mixing it with
    min/max/first aggregates was measured to flip the whole plan to a
    SortAggregate over the n×|cols| expanded rows, ~20x slower), the
    null/min/max pass is a plain partial-aggregated scan, and the two
    1-row results cross-join before a row-local ``stack`` reshape. At
    100 TB swap the exact ``count(distinct)`` for
    ``approx_count_distinct`` — one pass, no Expand; kept exact here
    so the profile hash-matches the oracle.
    """
    o = load_table(spark, sf_dir, "orders")
    od_us = sql_epoch_us(o, "o_orderdate")
    exprs = []
    for c, kind in _PROFILE_COLS:
        exprs.append(
            F.expr(f"COUNT(*) - COUNT({c})").alias(f"{c}__nulls")
        )
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        elif kind == "ts":
            mn = f"CAST(MIN({od_us}) AS DOUBLE)"
            mx = f"CAST(MAX({od_us}) AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        exprs.append(F.expr(mn).alias(f"{c}__mnn"))
        exprs.append(F.expr(mx).alias(f"{c}__mxn"))
        if kind == "str":
            ms, xs = f"MIN({c})", f"MAX({c})"
        else:
            ms = xs = "CAST(NULL AS STRING)"
        exprs.append(F.expr(ms).alias(f"{c}__mns"))
        exprs.append(F.expr(xs).alias(f"{c}__mxs"))
    basic = o.agg(F.count(F.lit(1)).alias("n_rows"), *exprs)
    nd = o.agg(
        *[F.countDistinct(c).alias(f"{c}__nd") for c, _ in _PROFILE_COLS]
    )
    wide = basic.crossJoin(nd)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, {c}__mnn, {c}__mxn, {c}__mns, {c}__mxs"
        for c, _ in _PROFILE_COLS
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)",
    ).select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    ).orderBy("col_name")


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
        elif kind == "ts":
            mn = f"CAST(MIN(epoch_us({c})) AS DOUBLE)"
            mx = f"CAST(MAX(epoch_us({c})) AS DOUBLE)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        if kind == "str":
            ms, xs = f"MIN({c})", f"MAX({c})"
        else:
            ms = xs = "CAST(NULL AS VARCHAR)"
        parts.append(
            f"""
            SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
                   COUNT(*) - COUNT({c}) AS n_nulls,
                   COUNT(DISTINCT {c}) AS n_distinct,
                   {mn} AS min_num, {mx} AS max_num,
                   {ms} AS min_str, {xs} AS max_str
            FROM orders
            """
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


_DUCK_FMT = dict(
    n="n", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2"
)

ORACLE: dict[str, str] = {
    "q_correlation": f"""
      WITH b AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_quantity * {SCALE} + 0.5) AS BIGINT) AS x,
               CAST(FLOOR(l_extendedprice * {SCALE} + 0.5) AS BIGINT) AS y
        FROM lineitem
      ),
      a AS (
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sx2, SUM(y * y) AS sy2
        FROM b GROUP BY l_returnflag
      )
      SELECT l_returnflag, n,
             {_CORR.format(**_DUCK_FMT)} AS corr_qty_price,
             {_COV.format(**_DUCK_FMT)} AS cov_scaled
      FROM a ORDER BY l_returnflag
    """,
    "q_profile_tables": _profile_oracle(),
}


ROLL_DAYS = 30

# windowed Pearson r over exact integer power sums; CASE guards the
# zero-variance/short-window denominator identically on both engines
_ROLL_CORR = (
    "CASE WHEN ({n} >= 10) AND"
    " ({n} * CAST({sx2} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE)) > 0 AND"
    " ({n} * CAST({sy2} AS DOUBLE) - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE)) > 0"
    " THEN ({n} * CAST({sxy} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
    " / (sqrt({n} * CAST({sx2} AS DOUBLE) - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
    " * sqrt({n} * CAST({sy2} AS DOUBLE) - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE)))"
    " ELSE NULL END"
)


def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{ROLL_DAYS}-day rolling correlation between daily
    revenue and daily quantity — the mergeable-moments scheme of
    ``q_correlation`` pushed through a RANGE-frame window, so any
    second-order rolling statistic comes from six windowed integer
    sums over the DAILY series (one row per calendar day), never a
    rescan of raw lineitem per day.

    The daily power values multiply as DECIMAL(38) (Spark) / HUGEINT
    (DuckDB) — both exact, so the double formula is bit-identical.
    Windows under 10 days or with zero variance yield NULL.
    """
    from pyspark.sql.window import Window

    l = load_table(spark, sf_dir, "lineitem")
    daily = (
        l.groupBy(
            F.expr(
                "datediff(cast(l_shipdate as date), date'1970-01-01')"
            ).alias("day")
        )
        .agg(
            F.sum(
                F.expr(
                    "cast(floor(l_extendedprice * (1 - l_discount) + 0.5)"
                    " as bigint)"
                )
            ).alias("x"),
            F.sum(
                F.expr("cast(floor(l_quantity + 0.5) as bigint)")
            ).alias("y"),
        )
    )
    w = Window.orderBy("day").rangeBetween(-(ROLL_DAYS - 1), 0)
    # unpartitioned RANGE window over the DAILY table: one row per
    # calendar day (bounded, thousands of rows for decades) — same
    # justified shape as q_moving_avg
    fmt = dict(n="n", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2")
    return (
        daily.select(
            "day",
            F.count(F.lit(1)).over(w).alias("n"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).over(w).alias("sx"),
            F.sum(F.expr("CAST(y AS DECIMAL(38,0))")).over(w).alias("sy"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).over(w).alias("sxy"),
            F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).over(w).alias("sx2"),
            F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).over(w).alias("sy2"),
        )
        .select(
            "day",
            F.col("n").alias("n_days"),
            F.expr(_ROLL_CORR.format(**fmt)).alias("roll_corr"),
        )
        .orderBy("day")
    )


ORACLE["q_rolling_corr"] = f"""
  WITH daily AS (
    SELECT epoch_us(l_shipdate) // 86400000000 AS day,
           SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) + 0.5)
               AS BIGINT)) AS x,
           SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS y
    FROM lineitem GROUP BY 1
  ),
  win AS (
    SELECT day,
           COUNT(*) OVER w AS n,
           SUM(CAST(x AS HUGEINT)) OVER w AS sx,
           SUM(CAST(y AS HUGEINT)) OVER w AS sy,
           SUM(CAST(x AS HUGEINT) * y) OVER w AS sxy,
           SUM(CAST(x AS HUGEINT) * x) OVER w AS sx2,
           SUM(CAST(y AS HUGEINT) * y) OVER w AS sy2
    FROM daily
    WINDOW w AS (ORDER BY day
                 RANGE BETWEEN {ROLL_DAYS - 1} PRECEDING AND CURRENT ROW)
  )
  SELECT day, n AS n_days,
         {_ROLL_CORR.format(n="n", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2")}
           AS roll_corr
  FROM win ORDER BY day
"""


def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median absolute deviation of order value per priority —
    the robust-statistics outlier scale, computed as two rank-select
    medians (type-1 discrete: value at ceil(n/2)) over exact scaled
    bigints, so every engine and parallelism agrees bit-for-bit.

    Phase 1 medians broadcast back onto the rows (5 groups — at any
    scale the median table is |groups|-sized); phase 2 repeats the
    rank-select on |v - med|. Both windows partition by the group key,
    bounding each per-key sort.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    base = o.select("o_orderpriority", v.alias("v"))

    def rank_median(df, col, out):
        wr = Window.partitionBy("o_orderpriority").orderBy(col)
        wn = Window.partitionBy("o_orderpriority")
        return (
            df.withColumn("__rn", F.row_number().over(wr))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .groupBy("o_orderpriority")
            .agg(
                F.max(
                    F.expr(
                        f"case when __rn = cast(ceil(0.5 * __n) as bigint)"
                        f" then {col} end"
                    )
                ).alias(out)
            )
        )

    med = rank_median(base, "v", "med_v")
    dev = base.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority", F.expr("abs(v - med_v)").alias("d")
    )
    mad = rank_median(dev, "d", "mad_v")
    return (
        med.join(mad, "o_orderpriority")
        .select(
            "o_orderpriority",
            F.expr(f"CAST(med_v AS DOUBLE) / {SCALE}.0").alias("median_price"),
            F.expr(f"CAST(mad_v AS DOUBLE) / {SCALE}.0").alias("mad_price"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE["q_mad"] = f"""
  WITH b AS (
    SELECT o_orderpriority,
           CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  r1 AS (
    SELECT o_orderpriority, v,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY v) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM b
  ),
  med AS (
    SELECT o_orderpriority,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN v END) AS med_v
    FROM r1 GROUP BY 1
  ),
  d AS (
    SELECT b.o_orderpriority, ABS(b.v - m.med_v) AS d
    FROM b JOIN med m ON b.o_orderpriority = m.o_orderpriority
  ),
  r2 AS (
    SELECT o_orderpriority, d,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY d) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM d
  ),
  mad AS (
    SELECT o_orderpriority,
           MAX(CASE WHEN rn = CAST(CEIL(0.5 * n) AS BIGINT) THEN d END) AS mad_v
    FROM r2 GROUP BY 1
  )
  SELECT m.o_orderpriority,
         CAST(m.med_v AS DOUBLE) / {SCALE}.0 AS median_price,
         CAST(a.mad_v AS DOUBLE) / {SCALE}.0 AS mad_price
  FROM med m JOIN mad a ON m.o_orderpriority = a.o_orderpriority
  ORDER BY 1
"""


def orphans(label, child, ckey, parent, pkey, bcast):
    """1-row orphan count for one FK edge: child keys with no parent
    (left-anti join; parent key set broadcast when dimension-sized)."""
    pk = parent.select(F.col(pkey).alias(ckey)).distinct()
    if bcast:
        pk = F.broadcast(pk)
    return child.select(ckey).join(pk, ckey, "left_anti").agg(
        F.lit(label).alias("check_name"),
        F.count(F.lit(1)).alias("n_bad"),
    )


def dup_pk(label, table, key):
    """1-row count of rows participating in duplicated primary keys."""
    return (
        table.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(
            F.lit(label).alias("check_name"),
            F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_bad"),
        )
    )


def q_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-load referential-integrity audit: orphan counts for each
    foreign-key edge of the star schema plus primary-key duplicate
    counts — the validation suite a warehouse runs after COPY.

    Every check is a left-anti join (orphans) or a groupBy-HAVING
    (duplicate keys) — partial-aggregated, broadcast where the parent
    side is dimension-sized; the per-check 1-row results union into
    one small report. At 100 TB each check stays a single scan of the
    child table with the parent key set broadcast (dims) or
    co-shuffled (orders).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    checks = [
        orphans("lineitem_orphan_orderkey", l, "l_orderkey", o, "o_orderkey", False),
        orphans("orders_orphan_custkey", o, "o_custkey", c, "c_custkey", True),
        orphans("customer_orphan_nationkey", c, "c_nationkey", n, "n_nationkey", True),
        dup_pk("orders_dup_orderkey", o, "o_orderkey"),
        dup_pk("customer_dup_custkey", c, "c_custkey"),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionByName(ch)
    return out.orderBy("check_name")


ORACLE["q_fk_integrity"] = """
  SELECT * FROM (
    SELECT 'lineitem_orphan_orderkey' AS check_name, COUNT(*) AS n_bad
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_orphan_custkey', COUNT(*)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'customer_orphan_nationkey', COUNT(*)
    FROM customer c WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'orders_dup_orderkey',
           CAST(COALESCE(SUM(cnt), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey
          HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'customer_dup_custkey',
           CAST(COALESCE(SUM(cnt), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS cnt FROM customer GROUP BY c_custkey
          HAVING COUNT(*) > 1)
  ) ORDER BY check_name
"""


# -- winsorized / trimmed mean ---------------------------------------------

WINSOR_LO = 0.05  # clip below the 5th percentile
WINSOR_HI = 0.95  # and above the 95th


def q_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed means of order value per priority — the
    robust location estimates that cap (winsorize) or drop (trim) the
    tails before averaging, next to q_mad's robust scale.

    Exactness: the P5/P95 fences are type-1 rank-select values at
    ceil(q·n) over exact scaled bigints (the q_mad convention —
    stats.py:305), clipping is integer CASE arithmetic, and each mean
    closes as ONE double division of two exact bigints — identical
    IEEE op on both engines. The fence table is |groups|-sized and
    broadcasts back onto the rows; per-group windows bound the sorts.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    base = o.select("o_orderpriority", v.alias("v"))
    wr = Window.partitionBy("o_orderpriority").orderBy("v")
    wn = Window.partitionBy("o_orderpriority")
    fences = (
        base.withColumn("__rn", F.row_number().over(wr))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .groupBy("o_orderpriority")
        .agg(
            *[
                F.max(
                    F.expr(
                        f"case when __rn = cast(ceil({q} * __n) as bigint)"
                        " then v end"
                    )
                ).alias(name)
                for name, q in (("lo", WINSOR_LO), ("hi", WINSOR_HI))
            ]
        )
    )
    clipped = base.join(F.broadcast(fences), "o_orderpriority").select(
        "o_orderpriority",
        "v",
        "lo",
        "hi",
        F.expr(
            "case when v < lo then lo when v > hi then hi else v end"
        ).alias("w"),
    )
    return (
        clipped.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                f"cast(sum(w) as double) / cast(count(1) as double)"
                f" / {SCALE}.0"
            ).alias("winsor_mean"),
            F.expr(
                "cast(sum(case when v >= lo and v <= hi then v end)"
                " as double)"
                " / cast(count(case when v >= lo and v <= hi then 1 end)"
                f" as double) / {SCALE}.0"
            ).alias("trimmed_mean"),
            F.expr(
                f"cast(sum(v) as double) / cast(count(1) as double)"
                f" / {SCALE}.0"
            ).alias("raw_mean"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE["q_winsorized"] = f"""
  WITH b AS (
    SELECT o_orderpriority,
           CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  r AS (
    SELECT o_orderpriority, v,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY v) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM b
  ),
  fences AS (
    SELECT o_orderpriority,
           MAX(CASE WHEN rn = CAST(CEIL({WINSOR_LO} * n) AS BIGINT)
                    THEN v END) AS lo,
           MAX(CASE WHEN rn = CAST(CEIL({WINSOR_HI} * n) AS BIGINT)
                    THEN v END) AS hi
    FROM r GROUP BY 1
  ),
  c AS (
    SELECT b.o_orderpriority, v, lo, hi,
           CASE WHEN v < lo THEN lo WHEN v > hi THEN hi ELSE v END AS w
    FROM b JOIN fences f ON b.o_orderpriority = f.o_orderpriority
  )
  SELECT o_orderpriority,
         COUNT(*) AS n,
         CAST(SUM(w) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE) / {SCALE}.0
           AS winsor_mean,
         CAST(SUM(CASE WHEN v >= lo AND v <= hi THEN v END) AS DOUBLE)
           / CAST(COUNT(CASE WHEN v >= lo AND v <= hi THEN 1 END) AS DOUBLE)
           / {SCALE}.0 AS trimmed_mean,
         CAST(SUM(v) AS DOUBLE) / CAST(COUNT(1) AS DOUBLE) / {SCALE}.0
           AS raw_mean
  FROM c GROUP BY 1 ORDER BY 1
"""


# -- decile lift / gains ---------------------------------------------------

LIFT_N_TILES = 10


def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative-gains table for a score against a
    binary outcome — the model-evaluation report read before any
    targeting decision: rank orders by value (score, descending),
    split into exact deciles, and ask how concentrated URGENT orders
    are in the top tiles.

    Exactness: deciles come from operators.ranking.global_ntile's
    range-partitioned exact global rank over (−v, key) — no
    one-partition NTILE window — and every count is an exact bigint.
    lift and cum_gain close as IDENTICAL division sequences on both
    engines (division of exact integers, no sums of doubles), and the
    10-row cumulative window is driver-trivial. Scale: one ranked
    pass + a 10-group aggregate; nothing grows with data volume but
    the rank itself.
    """
    from locopy_spark.operators.ranking import global_ntile

    o = load_table(spark, sf_dir, "orders")
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    base = o.select(
        "o_orderkey",
        (-v).alias("v_neg"),
        F.expr(
            "cast(o_orderpriority = '1-URGENT' as bigint)"
        ).alias("pos"),
    )
    tiled = global_ntile(
        base, order_cols=["v_neg", "o_orderkey"], n=LIFT_N_TILES,
        out_col="decile",
    )
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pos").alias("n_pos"),
    )
    from pyspark.sql.window import Window

    wcum = (
        Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per.withColumn("cum_n", F.sum("n").over(wcum))
        .withColumn("cum_pos", F.sum("n_pos").over(wcum))
        .withColumn("tot_n", F.sum("n").over(wtot))
        .withColumn("tot_pos", F.sum("n_pos").over(wtot))
        .select(
            "decile",
            "n",
            "n_pos",
            "cum_pos",
            F.expr(
                # zero positives anywhere (constant class, possible
                # mid-stream): NULL, not an ANSI divide crash
                "CASE WHEN n = 0 OR tot_pos = 0 THEN CAST(NULL AS DOUBLE)"
                " ELSE CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)"
                " / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE)) END"
            ).alias("lift"),
            F.expr(
                "CASE WHEN tot_pos = 0 THEN CAST(NULL AS DOUBLE)"
                " ELSE CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) END"
            ).alias("cum_gain"),
        )
        .orderBy("decile")
    )


ORACLE["q_decile_lift"] = f"""
  WITH b AS (
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v,
           CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS pos
    FROM orders
  ),
  tiled AS (
    SELECT pos,
           NTILE({LIFT_N_TILES}) OVER (ORDER BY v DESC, o_orderkey)
             AS decile
    FROM b
  ),
  per AS (
    SELECT decile, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos
    FROM tiled GROUP BY 1
  ),
  cum AS (
    SELECT decile, n, n_pos,
           CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
           CAST(SUM(n) OVER () AS BIGINT) AS tot_n,
           CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos
    FROM per
  )
  SELECT decile, n, n_pos, cum_pos,
         CASE WHEN n = 0 OR tot_pos = 0 THEN CAST(NULL AS DOUBLE)
           ELSE CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)
           / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE)) END AS lift,
         CASE WHEN tot_pos = 0 THEN CAST(NULL AS DOUBLE)
           ELSE CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) END AS cum_gain
  FROM cum ORDER BY decile
"""


# -- weighted quantiles ----------------------------------------------------

WQ_QUANTILES = ((1, "wp25"), (2, "wmedian"), (3, "wp75"))  # quarters


def q_weighted_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted P25/median/P75 of line price per return flag
    — the quantile where each row counts by its WEIGHT (units moved),
    not once; the inventory-pricing complement of q_percentiles'
    unweighted rank-select.

    Definition (lower weighted quantile): the first value v in the
    (value, tiebreak) order whose inclusive cumulative weight reaches
    q·W. Exactness: weights and values are exact bigints, the
    cumulative weight comes from operators.ranking.
    grouped_global_running_sum (range-partitioned — no
    one-task-per-group window over the fact table), and the q·W
    comparisons are integer cross-products (4·cumw ≥ k·W), so every
    engine and parallelism picks the identical value. The final
    aggregate is |groups|-sized.
    """
    from locopy_spark.operators.ranking import grouped_global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.expr(
            f"cast(floor(l_extendedprice * {SCALE} + 0.5) as bigint)"
        ).alias("v"),
        F.expr("cast(floor(l_quantity + 0.5) as bigint)").alias("w"),
        "l_orderkey",
        "l_linenumber",
    )
    cum = grouped_global_running_sum(
        base,
        group_cols=["l_returnflag"],
        order_cols=["v", "l_orderkey", "l_linenumber"],
        weight_col="w",
        out_col="cumw",
        total_col="tot_w",
    )
    aggs = [
        F.expr(
            f"CAST(MIN(CASE WHEN 4 * cumw >= {k} * tot_w THEN v END)"
            f" AS DOUBLE) / {SCALE}.0"
        ).alias(name)
        for k, name in WQ_QUANTILES
    ]
    return (
        cum.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.max("tot_w").alias("total_units"),
            *aggs,
        )
        .orderBy("l_returnflag")
    )


def _oracle_weighted_quantiles() -> str:
    picks = ",\n         ".join(
        f"CAST(MIN(CASE WHEN 4 * cumw >= {k} * tot_w THEN v END)"
        f" AS DOUBLE) / {SCALE}.0 AS {name}"
        for k, name in WQ_QUANTILES
    )
    return f"""
      WITH b AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_extendedprice * {SCALE} + 0.5) AS BIGINT) AS v,
               CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS w,
               l_orderkey, l_linenumber
        FROM lineitem
      ),
      c AS (
        SELECT l_returnflag, v, w,
               CAST(SUM(w) OVER (
                 PARTITION BY l_returnflag
                 ORDER BY v, l_orderkey, l_linenumber
               ) AS BIGINT) AS cumw,
               CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT)
                 AS tot_w
        FROM b
      )
      SELECT l_returnflag, COUNT(*) AS n_lines,
             CAST(MAX(tot_w) AS BIGINT) AS total_units,
         {picks}
      FROM c GROUP BY 1 ORDER BY 1
    """


ORACLE["q_weighted_quantiles"] = _oracle_weighted_quantiles()


# -- Gini concentration ----------------------------------------------------

def _gini_formula(fd: str, wide: str) -> str:
    """gini_ppb = ⌊Σ(2i−n−1)xᵢ · 1e9 / (n·Σx)⌋ over ascending-sorted
    x — numerator is ≥ 0 by rearrangement, so no sign dance; widened
    through ``wide`` (Spark DECIMAL(38,0) / DuckDB HUGEINT — the
    _ols_formulas convention) since num·1e9 passes bigint range long
    before the customer base is large. Inputs: rn, n, x as bigints;
    aggregates to (num, n, sx) then closes in the caller."""
    return (
        f"CAST(CAST(SUM(CAST(2 * rn - n - 1 AS {wide}) * x)"
        f" AS {wide}) * 1000000000"
        f" {fd} (CAST(MAX(n) AS {wide}) * SUM(x)) AS BIGINT)"
    )


def inequality_state(orders: DataFrame) -> DataFrame:
    """The additive inequality state ``(o_custkey, x)``: exact scaled
    revenue cents per customer — a plain-sum monoid, so a streaming
    maintainer (``streaming.stateful.stream_inequality``) merges
    per-batch rows by key; ranking, the zero-revenue fill from the
    customer dim, and both inequality reads happen only in the
    finishers."""
    return orders.groupBy("o_custkey").agg(
        F.sum(
            F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
        ).alias("x")
    )


def inequality_ranked(customer: DataFrame, state: DataFrame) -> DataFrame:
    """Close the ranked table over the state: left-join the customer
    dim (orderless customers at zero — concentration is a property of
    the whole base), then the range-partitioned grouped rank —
    columns (c_mktsegment, x, rn, n)."""
    from locopy_spark.operators.ranking import grouped_global_row_number

    rev = (
        customer.join(
            state, customer.c_custkey == state.o_custkey, "left"
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("x"), F.lit(0)).alias("x"),
        )
    )
    return grouped_global_row_number(
        rev,
        group_cols=["c_mktsegment"],
        order_cols=["x", "c_custkey"],
        out_col="rn",
        size_col="n",
    )


def _segment_revenue_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared inequality scaffolding of q_gini and q_lorenz_curve:
    ``inequality_state`` closed by ``inequality_ranked``."""
    return inequality_ranked(
        load_table(spark, sf_dir, "customer"),
        inequality_state(load_table(spark, sf_dir, "orders")),
    )


# Shared DuckDB scaffolding — CTE chain ending in r(c_mktsegment, x, rn, n).
_SQL_SEGMENT_RANKED = f"""
  WITH rev AS (
    SELECT c_custkey, c_mktsegment,
           COALESCE(CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5)
                                  AS BIGINT)) AS BIGINT), 0) AS x
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY 1, 2
  ),
  r AS (
    SELECT c_mktsegment, x,
           ROW_NUMBER() OVER (
             PARTITION BY c_mktsegment ORDER BY x, c_custkey
           ) AS rn,
           COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
    FROM rev
  )"""


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across the customer
    base, per market segment — the inequality index behind "what
    share of revenue do the top customers carry", with orderless
    customers included at zero (concentration is a property of the
    whole base, not just buyers).

    Exactness: per-customer revenue is exact scaled bigints, the
    ascending rank comes from operators.ranking.
    grouped_global_row_number (range-partitioned — no
    one-task-per-segment window), and the classic formula
    Σ(2i−n−1)xᵢ / (n·Σx) closes as ONE exact integer division in ppb
    through DECIMAL(38)/HUGEINT widening (the _ols_formulas
    convention), so the gate compares integers, not float sums.
    """
    return gini_from_ranked(_segment_revenue_ranked(spark, sf_dir))


def gini_from_ranked(ranked: DataFrame) -> DataFrame:
    """Gini finisher over any (c_mktsegment, x, rn, n) ranked table."""
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.max("n").alias("n_customers"),
            F.expr(f"CAST(SUM(x) AS DOUBLE) / {SCALE}.0").alias(
                "total_revenue"
            ),
            F.expr(_gini_formula("div", "DECIMAL(38,0)")).alias("gini_ppb"),
        )
        .orderBy("c_mktsegment")
    )


ORACLE["q_gini"] = f"""
  {_SQL_SEGMENT_RANKED}
  SELECT c_mktsegment,
         CAST(MAX(n) AS BIGINT) AS n_customers,
         CAST(SUM(x) AS DOUBLE) / {SCALE}.0 AS total_revenue,
         {_gini_formula("//", "HUGEINT")} AS gini_ppb
  FROM r GROUP BY 1 ORDER BY 1
"""


# -- Lorenz curve -------------------------------------------------------------


def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of revenue concentration per market segment: for
    each ascending-revenue customer decile, the cumulative share of
    segment revenue in ppm — the curve the q_gini scalar summarizes
    (and the standard visualization of "the top decile carries X%").

    Shares the ``_segment_revenue_ranked`` scaffolding with q_gini.
    Exactness: the decile id is a floor division on the exact rank
    ((rn−1)·10 div n), per-decile sums are exact bigints, and the
    cumulative share closes as one floor division in ppm through
    DECIMAL(38)/HUGEINT widening. Scale shape: after the ranked
    scaffolding the curve is ONE |segments×10|-bounded aggregate; the
    running share is a window over that bounded table, never over
    data-sized rows.
    """
    return lorenz_from_ranked(_segment_revenue_ranked(spark, sf_dir))


def lorenz_from_ranked(ranked: DataFrame) -> DataFrame:
    """Lorenz finisher over any (c_mktsegment, x, rn, n) ranked table."""
    from pyspark.sql.window import Window

    dec = (
        ranked.select(
            "c_mktsegment",
            "x",
            F.expr("(rn - 1) * 10 div n + 1").alias("decile"),
        )
        .groupBy("c_mktsegment", "decile")
        .agg(F.sum("x").alias("dx"), F.count(F.lit(1)).alias("n_customers"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy("decile")
    tot = Window.partitionBy("c_mktsegment")
    return (
        dec.withColumn("cum_x", F.sum("dx").over(w))
        .withColumn("tot_x", F.sum("dx").over(tot))
        .select(
            "c_mktsegment",
            "decile",
            "n_customers",
            F.expr(f"CAST(dx AS DOUBLE) / {SCALE}.0").alias("decile_revenue"),
            F.expr(
                "cast(cast(cum_x as decimal(38,0)) * 1000000"
                " div greatest(tot_x, 1) as bigint)"
            ).alias("cum_share_ppm"),
        )
        .orderBy("c_mktsegment", "decile")
    )


ORACLE["q_lorenz_curve"] = f"""
  {_SQL_SEGMENT_RANKED},
  dec AS (
    SELECT c_mktsegment, (rn - 1) * 10 // n + 1 AS decile,
           CAST(SUM(x) AS BIGINT) AS dx,
           COUNT(*) AS n_customers
    FROM r GROUP BY 1, 2
  )
  SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
         CAST(n_customers AS BIGINT) AS n_customers,
         CAST(dx AS DOUBLE) / {SCALE}.0 AS decile_revenue,
         CAST(CAST(SUM(dx) OVER (
                PARTITION BY c_mktsegment ORDER BY decile
              ) AS HUGEINT) * 1000000
              // GREATEST(SUM(dx) OVER (PARTITION BY c_mktsegment), 1)
              AS BIGINT) AS cum_share_ppm
  FROM dec ORDER BY c_mktsegment, decile
"""


# -- two-sample Kolmogorov–Smirnov -----------------------------------------

KS_SEG_A = "BUILDING"
KS_SEG_B = "MACHINERY"
# Kolmogorov critical coefficient at α=0.05 (two-sample): c(α)=1.358
KS_C95 = 1.358


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic comparing the
    order-value distributions of two customer segments — the
    distribution-drift test run before pooling cohorts (an A/A-shaped
    pair here, so D should sit under the critical value).

    Exact construction: D = max_x |F_A(x) − F_B(x)| over the pooled
    values, computed WITHOUT floats as the running-max trick — each
    distinct value contributes s(v) = d_A(v)·n_B − d_B(v)·n_A
    (per-value counts cross-multiplied by the other side's total, so
    the prefix sum IS c_A·n_B − c_B·n_A, the common-denominator ECDF
    gap), one range-partitioned exclusive prefix sum over the
    |distinct values|-sized aggregate (operators.ranking.
    global_running_sum — no one-partition window), then MAX(ABS(·)).
    Products widen through DECIMAL(38)/HUGEINT (n_A·n_B outgrows
    bigint at planet scale). Closes as integer ppb + one deterministic
    double expression for the α=0.05 decision (identical text both
    engines).
    """
    return ks_report(
        cliffs_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )
    )


def ks_report(grid: DataFrame) -> DataFrame:
    """Close the KS panel over any (v, d_a, d_b) per-value segment
    grid — since late r8 the SAME ``cliffs_state`` the stream_cliffs
    maintainer keeps live (one state: location test, shape test and
    effect size)."""
    from locopy_spark.operators.ranking import global_running_sum

    tot = grid.agg(
        F.sum("d_a").alias("n_a"),
        F.sum("d_b").alias("n_b"),
    )
    g = (
        grid.crossJoin(F.broadcast(tot))
        .select(
            "v",
            "n_a",
            "n_b",
            F.expr(
                "CAST(d_a AS DECIMAL(38,0)) * n_b"
                " - CAST(d_b AS DECIMAL(38,0)) * n_a"
            ).alias("s"),
        )
    )
    cum = global_running_sum(g, order_cols=["v"], value_col="s", out_col="pre")
    return (
        cum.select(
            "n_a", "n_b", F.expr("ABS(pre + s)").alias("gap")
        )
        .groupBy("n_a", "n_b")
        .agg(
            F.expr(
                # one-segment-empty (possible mid-stream, never on the
                # gated tables): NULL, not an ANSI divide-by-zero crash
                "CASE WHEN MAX(n_a) = 0 OR MAX(n_b) = 0 THEN NULL ELSE"
                " CAST(CAST(MAX(gap) AS DECIMAL(38,0)) * 1000000000"
                " div (CAST(MAX(n_a) AS DECIMAL(38,0)) * MAX(n_b))"
                " AS BIGINT) END"
            ).alias("d_ppb")
        )
        .select(
            "n_a",
            "n_b",
            "d_ppb",
            F.expr(
                "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE"
                " CAST(d_ppb AS DOUBLE) / 1000000000.0"
                f" > {KS_C95} * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS"
                " DOUBLE)) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))"
                " END"
            ).alias("reject_95"),
        )
    )


ORACLE["q_ks_test"] = f"""
  WITH vals AS (
    SELECT CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v,
           c_mktsegment = '{KS_SEG_A}' AS is_a
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
  ),
  tot AS (
    SELECT CAST(SUM(CAST(is_a AS BIGINT)) AS BIGINT) AS n_a,
           CAST(SUM(CAST(NOT is_a AS BIGINT)) AS BIGINT) AS n_b
    FROM vals
  ),
  g AS (
    SELECT v,
           CAST(SUM(CAST(is_a AS BIGINT)) AS HUGEINT) * MAX(t.n_b)
             - CAST(SUM(CAST(NOT is_a AS BIGINT)) AS HUGEINT) * MAX(t.n_a)
             AS s,
           MAX(t.n_a) AS n_a, MAX(t.n_b) AS n_b
    FROM vals, tot t GROUP BY v
  ),
  cum AS (
    SELECT n_a, n_b, ABS(SUM(s) OVER (ORDER BY v)) AS gap FROM g
  ),
  agg AS (
    SELECT n_a, n_b,
           CASE WHEN MAX(n_a) = 0 OR MAX(n_b) = 0 THEN NULL ELSE
             CAST(CAST(MAX(gap) AS HUGEINT) * 1000000000
                  // (CAST(MAX(n_a) AS HUGEINT) * MAX(n_b)) AS BIGINT)
           END AS d_ppb
    FROM cum GROUP BY n_a, n_b
  )
  SELECT n_a, n_b, d_ppb,
         CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
           CAST(d_ppb AS DOUBLE) / 1000000000.0
             > {KS_C95} * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
         END AS reject_95
  FROM agg
"""


# -- Mann–Whitney U (rank-sum) ---------------------------------------------

def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney U rank-sum test on the same two segments as
    q_ks_test — the location-shift complement to KS's shape test,
    float-free: ranks are pooled with ties averaged, kept integer by
    DOUBLING (a tie run over ranks [a,b] gives each member average
    rank (a+b)/2, so doubled rank = a+b = 2·cum_before + t + 1
    exactly). One range-partitioned prefix sum over the per-value
    aggregate (the q_ks_test plumbing) yields every run's start;
    U, the tie count T = Σ(t³−t), and n's close as exact bigints
    (T widened through DECIMAL(38)/HUGEINT), and the tie-corrected
    normal z closes as one deterministic double expression shared
    verbatim by both engines.
    """
    return mw_report(
        cliffs_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )
    )


def mw_report(grid: DataFrame) -> DataFrame:
    """Close the U/z panel over any (v, d_a, d_b) per-value segment
    grid — since late r8 the SAME ``cliffs_state`` the stream_cliffs
    maintainer keeps live (t = d_a + d_b reproduces the pooled run
    lengths exactly)."""
    from locopy_spark.operators.ranking import global_running_sum

    g = grid.selectExpr("v", "d_a", "d_a + d_b AS t")
    cum = global_running_sum(g, order_cols=["v"], value_col="t", out_col="pre")
    agg = cum.agg(
        F.sum("d_a").alias("n_a"),
        F.expr("SUM(t - d_a)").alias("n_b"),
        # doubled rank sum of sample A: Σ d_a · (2·pre + t + 1)
        F.expr("SUM(d_a * (2 * pre + t + 1))").alias("r_a_x2"),
        F.expr(
            "CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS DECIMAL(38,0))"
        ).alias("ties_t"),
    )
    # doubled U_A = doubled R_A − n_a(n_a+1); z from the tie-corrected
    # normal approximation — one double expression, identical text on
    # both engines (every input is an exact integer).  Degenerate
    # grids (one segment empty, or EVERY pooled value in one tie run,
    # both possible mid-stream) have zero rank variance: NULL, not an
    # ANSI divide-by-zero crash.
    var_expr = (
        "CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS DOUBLE) ELSE"
        " CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0"
        " * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)"
        " - CAST(ties_t AS DOUBLE)"
        " / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))"
        " * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))) END"
    )
    z_expr = (
        "CASE WHEN mw_var IS NULL OR mw_var <= 0.0"
        " THEN CAST(NULL AS DOUBLE) ELSE"
        " (CAST(u_a_x2 AS DOUBLE) / 2.0"
        " - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)"
        " / sqrt(mw_var) END"
    )
    return (
        agg.select(
            "n_a",
            "n_b",
            F.expr("CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT)").alias(
                "u_a_x2"
            ),
            F.expr("CAST(ties_t AS BIGINT)").alias("ties_t"),
        )
        .select("n_a", "n_b", "u_a_x2", "ties_t",
                F.expr(var_expr).alias("mw_var"))
        .select("n_a", "n_b", "u_a_x2", "ties_t", F.expr(z_expr).alias("z"))
    )


ORACLE["q_mann_whitney"] = f"""
  WITH vals AS (
    SELECT CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v,
           c_mktsegment = '{KS_SEG_A}' AS is_a
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
  ),
  g AS (
    SELECT v, CAST(SUM(CAST(is_a AS BIGINT)) AS BIGINT) AS d_a,
           COUNT(*) AS t
    FROM vals GROUP BY v
  ),
  cum AS (
    SELECT d_a, t,
           CAST(COALESCE(SUM(t) OVER (
             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS pre
    FROM g
  ),
  agg AS (
    SELECT CAST(SUM(d_a) AS BIGINT) AS n_a,
           CAST(SUM(t - d_a) AS BIGINT) AS n_b,
           CAST(SUM(d_a * (2 * pre + t + 1)) AS BIGINT) AS r_a_x2,
           CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties_t
    FROM cum
  ),
  fin AS (
    SELECT n_a, n_b,
           CAST(r_a_x2 - n_a * (n_a + 1) AS BIGINT) AS u_a_x2,
           CAST(ties_t AS BIGINT) AS ties_t
    FROM agg
  ),
  vard AS (
    SELECT *,
           CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(NULL AS DOUBLE) ELSE
             CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
             * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0)
               - CAST(ties_t AS DOUBLE)
               / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))
           END AS mw_var
    FROM fin
  )
  SELECT n_a, n_b, u_a_x2, ties_t,
         CASE WHEN mw_var IS NULL OR mw_var <= 0.0
           THEN CAST(NULL AS DOUBLE) ELSE
           (CAST(u_a_x2 AS DOUBLE) / 2.0
            - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
           / sqrt(mw_var)
         END AS z
  FROM vard
"""


# -- Spearman rank correlation ----------------------------------------------

def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between order value and order
    width (line count) — the monotone-association complement to
    ``q_correlation``'s Pearson, robust to the price distribution's
    tail.

    Tie-averaged pooled ranks stay integer by DOUBLING (the
    ``q_mann_whitney`` device: a tie run's doubled rank is
    2·cum_before + t + 1, one range-partitioned prefix sum over each
    variable's per-value aggregate), then CENTERING by the exact mean
    n+1 (the doubled-rank mean regardless of ties, since doubled ranks
    always sum to n(n+1)) keeps every power sum below ~n³ — under 2^53
    through n ≈ 2·10⁵ so the final double casts are exact on both
    engines (DuckDB's int128→double is not correctly rounded; the
    centered sums never reach int128 territory at gate SFs). rho
    closes as one shared double expression over three exact integer
    sums. For larger n, downshift the centered ranks (rho is
    rank-scale-invariant).

    Scale shape: lineitem partial-aggregates to per-order counts
    (map-side combine), per-value rank tables join back on the value
    (the y-side rank table is |distinct counts|-sized → broadcast);
    nothing all-pairs, no one-partition window.
    """
    from locopy_spark.functions.cache import managed_persist
    from locopy_spark.operators.ranking import global_running_sum

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("y")
    )
    # persisted (r11): four subtrees read it (both rank tables, the
    # row total, the centered join) — un-persisted, each replayed the
    # orders⋈lineitem join
    base = managed_persist(
        o.select(
            "o_orderkey",
            F.expr(
                f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)"
            ).alias("x"),
        ).join(cnt, "o_orderkey"),
        "spearman",
    )

    def doubled_ranks(col: str, out: str, bounded: bool = False) -> DataFrame:
        g = base.groupBy(col).agg(F.count(F.lit(1)).alias("t"))
        cum = global_running_sum(
            g, order_cols=[col], value_col="t", out_col="pre",
            bounded=bounded,
        )
        return cum.select(col, F.expr("2 * pre + t + 1").alias(out))

    tot = base.agg(F.count(F.lit(1)).alias("n"))
    joined = (
        base.join(doubled_ranks("x", "rx2"), "x")
        # y = lines-per-order counts: the rank grid is |max basket|-
        # bounded (a handful of rows), so the bounded window arm skips
        # the range sampler; x (scaled prices) stays on the device.
        .join(F.broadcast(doubled_ranks("y", "ry2", bounded=True)), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            F.expr("rx2 - (n + 1)").alias("cx"),
            F.expr("ry2 - (n + 1)").alias("cy"),
        )
    )
    agg = joined.groupBy("n").agg(
        F.expr("CAST(SUM(CAST(cx AS DECIMAL(38,0)) * cy) AS BIGINT)").alias(
            "sxy"
        ),
        F.expr("CAST(SUM(CAST(cx AS DECIMAL(38,0)) * cx) AS BIGINT)").alias(
            "sx2"
        ),
        F.expr("CAST(SUM(CAST(cy AS DECIMAL(38,0)) * cy) AS BIGINT)").alias(
            "sy2"
        ),
    )
    return agg.select(
        "n",
        "sxy",
        F.expr(
            # constant column (possible mid-stream): NULL, not a crash
            "CASE WHEN sx2 = 0 OR sy2 = 0 THEN CAST(NULL AS DOUBLE) ELSE"
            " CAST(sxy AS DOUBLE)"
            " / (sqrt(CAST(sx2 AS DOUBLE)) * sqrt(CAST(sy2 AS DOUBLE))) END"
        ).alias("rho"),
    )


ORACLE["q_spearman"] = f"""
  WITH base AS (
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS x,
           y
    FROM orders
    JOIN (SELECT l_orderkey AS o_orderkey, COUNT(*) AS y
          FROM lineitem GROUP BY 1) USING (o_orderkey)
  ),
  rx AS (
    SELECT x, 2 * (CAST(COALESCE(SUM(t) OVER (
             ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT)) + t + 1 AS rx2
    FROM (SELECT x, COUNT(*) AS t FROM base GROUP BY x)
  ),
  ry AS (
    SELECT y, 2 * (CAST(COALESCE(SUM(t) OVER (
             ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT)) + t + 1 AS ry2
    FROM (SELECT y, COUNT(*) AS t FROM base GROUP BY y)
  ),
  tot AS (SELECT COUNT(*) AS n FROM base),
  c AS (
    SELECT n, rx2 - (n + 1) AS cx, ry2 - (n + 1) AS cy
    FROM base JOIN rx USING (x) JOIN ry USING (y), tot
  ),
  agg AS (
    SELECT n,
           CAST(SUM(CAST(cx AS HUGEINT) * cy) AS BIGINT) AS sxy,
           CAST(SUM(CAST(cx AS HUGEINT) * cx) AS BIGINT) AS sx2,
           CAST(SUM(CAST(cy AS HUGEINT) * cy) AS BIGINT) AS sy2
    FROM c GROUP BY n
  )
  SELECT n, sxy,
         CASE WHEN sx2 = 0 OR sy2 = 0 THEN CAST(NULL AS DOUBLE) ELSE
           CAST(sxy AS DOUBLE)
           / (sqrt(CAST(sx2 AS DOUBLE)) * sqrt(CAST(sy2 AS DOUBLE)))
         END AS rho
  FROM agg
"""


# -- Wilcoxon signed-rank ----------------------------------------------------

WILCOXON_SPLIT = "1995-01-01"


def q_wilcoxon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Wilcoxon signed-rank test on paired customer spend:
    each customer's total order value before vs from {WILCOXON_SPLIT}
    (a no-spend half is a legitimate zero measurement). Zero
    differences drop (standard practice); |diff| ranks are
    tie-averaged via the doubled-rank prefix-sum device
    (``q_mann_whitney``), W⁺ doubles alongside, the tie term
    T = Σ(t³−t) widens through DECIMAL(38)/HUGEINT, and the
    tie-corrected normal z closes as one shared double expression:
    z = (W⁺ − n(n+1)/4) / sqrt(n(n+1)(2n+1)/24 − T/48).
    """
    o = load_table(spark, sf_dir, "orders")
    from locopy_spark.operators.ranking import global_running_sum

    v = f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)"
    pair = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.expr(
            f"sum(case when o_orderdate < date'{WILCOXON_SPLIT}'"
            f" then {v} else 0 end)"
        ).alias("x"),
        F.expr(
            f"sum(case when o_orderdate >= date'{WILCOXON_SPLIT}'"
            f" then {v} else 0 end)"
        ).alias("y"),
    )
    d = pair.select(F.expr("y - x").alias("d")).filter("d != 0")
    g = d.groupBy(F.expr("abs(d)").alias("ad")).agg(
        F.count(F.lit(1)).alias("t"),
        F.sum(F.expr("cast(d > 0 as bigint)")).alias("p"),
    )
    cum = global_running_sum(g, order_cols=["ad"], value_col="t", out_col="pre")
    agg = cum.agg(
        F.sum("t").alias("n_pairs"),
        F.sum(F.expr("p * (2 * pre + t + 1)")).alias("w_plus_x2"),
        F.expr(
            "CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS BIGINT)"
        ).alias("ties_t"),
    )
    # no scoreable pairs, or a tie structure that zeroes the variance
    # (possible mid-stream): NULL, not an ANSI divide crash
    z_expr = (
        "CASE WHEN n_pairs = 0"
        " OR CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)"
        " * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0"
        " - CAST(ties_t AS DOUBLE) / 48.0 <= 0.0"
        " THEN CAST(NULL AS DOUBLE) ELSE"
        " (CAST(w_plus_x2 AS DOUBLE) / 2.0"
        " - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) / 4.0)"
        " / sqrt(CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)"
        " * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0"
        " - CAST(ties_t AS DOUBLE) / 48.0) END"
    )
    return agg.select(
        "n_pairs", "w_plus_x2", "ties_t", F.expr(z_expr).alias("z")
    )


ORACLE["q_wilcoxon"] = f"""
  WITH pair AS (
    SELECT o_custkey,
           SUM(CASE WHEN o_orderdate < DATE '{WILCOXON_SPLIT}'
                    THEN CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)
                    ELSE 0 END) AS x,
           SUM(CASE WHEN o_orderdate >= DATE '{WILCOXON_SPLIT}'
                    THEN CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)
                    ELSE 0 END) AS y
    FROM orders GROUP BY 1
  ),
  d AS (SELECT CAST(y - x AS BIGINT) AS d FROM pair WHERE y - x != 0),
  g AS (
    SELECT ABS(d) AS ad, COUNT(*) AS t,
           CAST(SUM(CAST(d > 0 AS BIGINT)) AS BIGINT) AS p
    FROM d GROUP BY 1
  ),
  cum AS (
    SELECT t, p,
           CAST(COALESCE(SUM(t) OVER (
             ORDER BY ad ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS pre
    FROM g
  ),
  agg AS (
    SELECT CAST(SUM(t) AS BIGINT) AS n_pairs,
           CAST(SUM(p * (2 * pre + t + 1)) AS BIGINT) AS w_plus_x2,
           CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS ties_t
    FROM cum
  )
  SELECT n_pairs, w_plus_x2, ties_t,
         CASE WHEN n_pairs = 0
           OR CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)
           * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0
           - CAST(ties_t AS DOUBLE) / 48.0 <= 0.0
           THEN CAST(NULL AS DOUBLE) ELSE
           (CAST(w_plus_x2 AS DOUBLE) / 2.0
           - CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0) / 4.0)
           / sqrt(CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)
           * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0) / 24.0
           - CAST(ties_t AS DOUBLE) / 48.0)
         END AS z
  FROM agg
"""


# -- daily-revenue autocorrelation -------------------------------------------

ACF_MAX_LAG = 7


def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..{ACF_MAX_LAG} autocorrelation of daily order revenue —
    the weekly-seasonality fingerprint read before picking the
    Holt–Winters period.

    The raw table partial-aggregates once to the |days|-sized daily
    series (bounded by the calendar, not data volume — the
    ``q_anomaly_days`` shape, revenue in WHOLE currency units so the
    squared power sums stay inside bigint, whose double cast is
    correctly rounded on both engines; descale further past ~sf0.5).
    Each lag's pairs come from one tiny range self-join (|days|·7
    rows); per-lag exact bigint moments close through the shared
    Pearson expression.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice + 0.5) as bigint)")).alias("x")
    )
    return acf_over_daily(daily)


def acf_over_daily(daily: DataFrame, max_lag: int = ACF_MAX_LAG) -> DataFrame:
    """The lag-1..max_lag ACF scorer over any ``(day, x)`` daily
    series — shared by :func:`q_autocorr` and the streaming state view
    (``streaming.stateful.score_daily_acf``) so the stream-vs-batch
    test exercises series maintenance, not two scorer copies."""
    spark = daily.sparkSession
    lags = spark.range(1, max_lag + 1).select(F.col("id").alias("lag"))
    shifted = daily.crossJoin(F.broadcast(lags)).select(
        "lag",
        F.col("x").alias("x"),
        (F.col("day") + F.col("lag")).alias("day"),
    )
    pairs = shifted.join(
        daily.select("day", F.col("x").alias("y")), "day"
    ).select("lag", "x", "y")
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS BIGINT)").alias(
            "sxy"
        ),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS BIGINT)").alias(
            "sx2"
        ),
        F.expr("CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS BIGINT)").alias(
            "sy2"
        ),
    )
    corr = _CORR.format(
        n="CAST(n AS DOUBLE)", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2"
    )
    # acf is undefined when a side is constant (short series' longest
    # lags) — exact integer variance guard, DECIMAL(38) products since
    # (Σx)² outgrows bigint long before the sums themselves do
    var_ok = (
        "CAST(n AS DECIMAL(38,0)) * {s2} > CAST({s} AS DECIMAL(38,0)) * {s}"
    )
    return (
        agg.filter(
            F.expr(var_ok.format(s2="sx2", s="sx"))
            & F.expr(var_ok.format(s2="sy2", s="sy"))
        )
        .select("lag", "n", F.expr(corr).alias("acf"))
        .orderBy("lag")
    )


_ACF_CORR = _CORR.format(
    n="CAST(n AS DOUBLE)", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2"
)

ORACLE["q_autocorr"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS day,
           SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS x
    FROM orders GROUP BY 1
  ),
  pairs AS (
    SELECT l.lag, a.x AS x, b.x AS y
    FROM daily a
    CROSS JOIN (SELECT UNNEST(generate_series(1, {ACF_MAX_LAG})) AS lag) l
    JOIN daily b ON b.day = a.day + l.lag
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
  SELECT lag, n, {_ACF_CORR} AS acf
  FROM agg
  WHERE CAST(n AS HUGEINT) * sx2 > CAST(sx AS HUGEINT) * sx
    AND CAST(n AS HUGEINT) * sy2 > CAST(sy AS HUGEINT) * sy
  ORDER BY lag
"""


# -- Wald–Wolfowitz runs test ------------------------------------------------

def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of daily revenue
    around its median — flags regime drift / autocorrelation that a
    mean-level check misses.

    Everything runs on the |days|-sized daily aggregate (whole
    currency units, ``q_anomaly_days`` convention). The lower median
    is the exact type-1 rank-select (value at rn = ⌈n/2⌉ under the
    total order (x, day)) via the bounded-window global row number
    (the grid is |calendar days|-sized, so no range sampler);
    the above/not-above sign sequence's runs are counted by a
    rank-adjacency self-join (rn ↔ rn+1 — day gaps don't matter, rank
    order is the sequence), so no one-partition window touches
    anything unbounded. n₁/n₂/R close exact; z is one shared double
    expression: z = (R − μ)/σ, μ = 2n₁n₂/n + 1,
    σ² = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)).
    """
    from locopy_spark.operators.ranking import global_row_number

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice + 0.5) as bigint)")).alias("x")
    )
    # bounded arm (r12): daily is |calendar days|-sized at any volume,
    # so both rank passes run as plain windows (no range sampler).
    ranked = global_row_number(daily, ["x", "day"], out_col="vr",
                               bounded=True)
    tot = ranked.agg(F.count(F.lit(1)).alias("n"))
    med = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.expr("vr = cast(ceil(0.5 * n) as bigint)"))
        .select(F.col("x").alias("med"))
    )
    signed = (
        daily.crossJoin(F.broadcast(med))
        .select("day", F.expr("x > med").alias("above"))
    )
    seq = global_row_number(signed, ["day"], out_col="rn", bounded=True)
    prev = seq.select(
        F.expr("rn + 1").alias("rn"), F.col("above").alias("prev_above")
    )
    # broadcast hint (r12, §3.1): both adjacency sides are |days|-
    # bounded; without the hint the rank self-join was sort-merge
    switches = seq.join(F.broadcast(prev), "rn").agg(
        F.sum(F.expr("cast(above != prev_above as bigint)")).alias("n_switch")
    )
    counts = signed.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.expr("cast(above as bigint)")).alias("n_above"),
        F.sum(F.expr("cast(not above as bigint)")).alias("n_below"),
    )
    # a one-sided series (every day above or every day below the
    # median — constant input, possible mid-stream) zeroes the
    # variance: NULL, not an ANSI divide crash
    z_expr = (
        "CASE WHEN n_days <= 1 OR n_above = 0 OR n_below = 0"
        " THEN CAST(NULL AS DOUBLE) ELSE"
        " (CAST(runs AS DOUBLE)"
        " - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)"
        " / CAST(n_days AS DOUBLE) + 1.0))"
        " / sqrt(2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)"
        " * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)"
        " - CAST(n_days AS DOUBLE))"
        " / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)"
        " * (CAST(n_days AS DOUBLE) - 1.0))) END"
    )
    return (
        counts.crossJoin(F.broadcast(switches))
        .select(
            "n_days",
            "n_above",
            "n_below",
            F.expr("n_switch + 1").alias("runs"),
        )
        .select("n_days", "n_above", "n_below", "runs", F.expr(z_expr).alias("z"))
    )


ORACLE["q_runs_test"] = """
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS day,
           SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS x
    FROM orders GROUP BY 1
  ),
  ranked AS (
    SELECT x, ROW_NUMBER() OVER (ORDER BY x, day) AS vr,
           COUNT(*) OVER () AS n
    FROM daily
  ),
  med AS (
    SELECT x AS med FROM ranked WHERE vr = CAST(CEIL(0.5 * n) AS BIGINT)
  ),
  signed AS (
    SELECT day, x > med AS above FROM daily, med
  ),
  seq AS (
    SELECT above, LAG(above) OVER (ORDER BY day) AS prev FROM signed
  ),
  agg AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CAST(above AS BIGINT)) AS BIGINT) AS n_above,
           CAST(SUM(CAST(NOT above AS BIGINT)) AS BIGINT) AS n_below,
           CAST(1 + SUM(CASE WHEN prev IS NOT NULL AND above != prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS runs
    FROM seq
  )
  SELECT n_days, n_above, n_below, runs,
         CASE WHEN n_days <= 1 OR n_above = 0 OR n_below = 0
           THEN CAST(NULL AS DOUBLE) ELSE
           (CAST(runs AS DOUBLE)
           - (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
           / CAST(n_days AS DOUBLE) + 1.0))
           / sqrt(2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
           * (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE)
           - CAST(n_days AS DOUBLE))
           / (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE)
           * (CAST(n_days AS DOUBLE) - 1.0)))
         END AS z
  FROM agg
"""


# -- one-way ANOVA -------------------------------------------------------------

ANOVA_GROUPS = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def _anova_fixed_terms() -> tuple[str, str, str]:
    """(Σ s_g²/n_g chain, grand-sum chain, k chain) as FIXED-ORDER
    explicit five-term text — double addition is not associative, so
    the group sums are spelled out (the q_kruskal_wallis convention);
    identical text on both engines ⇒ identical IEEE results."""
    sb = " + ".join(
        f"(CASE WHEN n{i} > 0 THEN (CAST(s{i} AS DOUBLE) / n{i})"
        f" * CAST(s{i} AS DOUBLE) ELSE 0.0 END)"
        for i in range(1, len(ANOVA_GROUPS) + 1)
    )
    s = " + ".join(
        f"CAST(s{i} AS DOUBLE)" for i in range(1, len(ANOVA_GROUPS) + 1)
    )
    k = " + ".join(
        f"CAST(n{i} > 0 AS INT)" for i in range(1, len(ANOVA_GROUPS) + 1)
    )
    return sb, s, k


def q_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F test of order value across order priorities —
    the parametric companion to q_kruskal_wallis (which ranks) and
    q_stats_moments (which reports the per-group moments this test
    compares): does priority shift MEAN order value?

    Exactness: values are whole-dollar bigints, group sums and the
    global sum of squares accumulate in DECIMAL(38) (overflow-safe at
    any SF — the q_stats_moments device), and every double op runs on
    identical expression text with fixed term order, so F is
    bit-stable cross-engine. Scale shape: ONE conditional-aggregate
    pass over orders collapses to a single row (the Cochran–Armitage
    shape — also a streaming-friendly additive monoid); the F closure
    is row-local arithmetic on that row.
    """
    o = load_table(spark, sf_dir, "orders")
    return anova_report(anova_state(o))


def anova_state(orders: DataFrame) -> DataFrame:
    """The 1-row additive ANOVA state: n, Σv² and per-group (n_g, Σv_g)
    — every column a plain sum (commutative monoid), so a streaming
    maintainer adds per-batch rows and the F finisher closes over the
    merged row (stream_anova)."""
    v = orders.select(
        "o_orderpriority",
        F.expr("cast(floor(o_totalprice + 0.5) as bigint)").alias("v"),
    )
    return anova_state_from_values(v)


def anova_state_from_values(v: DataFrame) -> DataFrame:
    """The same 1-row power-sum state over ANY (o_orderpriority, v)
    bigint values table — shared by q_anova (raw order values) and
    q_levene (absolute deviations from the group median)."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("cast(v * v as decimal(38,0))")).alias("sq"),
    ]
    for i, g in enumerate(ANOVA_GROUPS, 1):
        aggs.append(
            F.sum(
                F.expr(f"case when o_orderpriority = '{g}' then 1 else 0 end")
            ).alias(f"n{i}")
        )
        aggs.append(
            F.sum(
                F.expr(
                    f"cast(case when o_orderpriority = '{g}' then v"
                    " else 0 end as decimal(38,0))"
                )
            ).alias(f"s{i}")
        )
    return v.agg(*aggs)


def anova_report(state: DataFrame) -> DataFrame:
    """Close F over the exact state with the fixed-order term chains
    (identical text on both engines)."""
    sb, s, k = _anova_fixed_terms()
    scored = state.selectExpr(
        "n",
        f"CAST({k} AS BIGINT) AS k",
        f"(({sb}) - (({s}) / n) * ({s})) AS ssb",
        f"((CAST(sq AS DOUBLE) - (({s}) / n) * ({s}))"
        f" - (({sb}) - (({s}) / n) * ({s}))) AS ssw",
    )
    return scored.selectExpr(
        "n",
        "k",
        "ssb",
        "ssw",
        "CASE WHEN k > 1 AND n > k AND ssw > 0.0"
        " THEN (ssb / (k - 1)) / (ssw / (n - k)) ELSE NULL END AS f_stat",
    )


def _sql_anova() -> str:
    sb, s, k = _anova_fixed_terms()
    cases = ",\n           ".join(
        f"CAST(SUM(CASE WHEN g = '{g}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i},\n"
        f"           SUM(CASE WHEN g = '{g}' THEN v ELSE 0 END) AS s{i}"
        for i, g in enumerate(ANOVA_GROUPS, 1)
    )
    return f"""
  WITH vals AS (
    SELECT o_orderpriority AS g,
           CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  agg AS (
    SELECT COUNT(*) AS n, SUM(v * v) AS sq,
           {cases}
    FROM vals
  ),
  scored AS (
    SELECT n, CAST({k} AS BIGINT) AS k,
           (({sb}) - (({s}) / n) * ({s})) AS ssb,
           ((CAST(sq AS DOUBLE) - (({s}) / n) * ({s}))
            - (({sb}) - (({s}) / n) * ({s}))) AS ssw
    FROM agg
  )
  SELECT n, k, ssb, ssw,
         CASE WHEN k > 1 AND n > k AND ssw > 0.0
              THEN (ssb / (k - 1)) / (ssw / (n - k)) ELSE NULL END AS f_stat
  FROM scored
"""


ORACLE["q_anova"] = _sql_anova()


# -- Brown–Forsythe variance homogeneity ---------------------------------------


def q_levene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown–Forsythe test (Levene with group medians) of order-value
    variance homogeneity across priorities — the check run BEFORE
    trusting q_anova's F (pooled-variance ANOVA assumes equal spreads;
    this tests exactly that assumption, median-centered so heavy tails
    don't fake a signal).

    Construction: per-priority exact rank-select median (the q_mad
    type-1 device — value at ceil(n/2) of the group sort, exact
    bigint), z = |v − med_g|, then the q_anova machinery VERBATIM over
    z (shared ``anova_state_from_values`` power sums + the shared
    fixed-order F closure — identical expression text on both
    engines). Scale shape: one per-group-partitioned rank pass, a
    |groups|-row broadcast back, one conditional-aggregate pass to a
    1-row state.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    return levene_report(
        levene_state(load_table(spark, sf_dir, "orders"))
    )


def levene_state(orders: DataFrame) -> DataFrame:
    """The (priority, whole-dollar value) grid ``(o_orderpriority, v,
    cnt)`` — a plain-sum monoid (late chunks add in), bounded by
    |priorities|·|dollar values| REGARDLESS of order volume (the
    leadtime-grid device: at 100 TB this is the difference between a
    value-domain-sized state and a data-sized rank window). Shared by
    ``q_levene`` and ``streaming.stateful.stream_levene``.

    Refactored from a per-row row_number rank pass in late r8: the
    grid reproduces the type-1 lower median exactly (smallest v with
    cum ≥ ⌈n/2⌉) and every downstream power sum is a cnt-weighted
    grid sum — bit-identical output, re-gated at all three SFs."""
    return orders.groupBy(
        "o_orderpriority",
        F.expr("cast(floor(o_totalprice + 0.5) as bigint)").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))


def levene_report(grid: DataFrame) -> DataFrame:
    """Close Brown–Forsythe over any (o_orderpriority, v, cnt) grid:
    grid-sized cumulative sums pick each group's exact median, then
    the shared ANOVA F closure runs over cnt-weighted power sums of
    the absolute deviations.

    The grid is persisted before fan-out (the friedman_report lesson):
    FOUR subtrees (totals, cumulative sums, the median pick, and the
    deviation pass) consume it, and the persist makes the data-sized
    orders scan run once instead of per-subtree."""
    from pyspark.sql.window import Window

    from locopy_spark.functions.cache import managed_persist

    grid = managed_persist(grid, "levene_grid")
    wc = Window.partitionBy("o_orderpriority").orderBy("v")
    tot = grid.groupBy("o_orderpriority").agg(
        F.sum("cnt").alias("n_g")
    )
    cum = grid.select(
        "o_orderpriority", "v", F.sum("cnt").over(wc).alias("cum")
    )
    med = (
        cum.join(F.broadcast(tot), "o_orderpriority")
        .filter("cum >= (n_g + 1) div 2")
        .groupBy("o_orderpriority")
        .agg(F.min("v").alias("med_v"))
    )
    z = grid.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        F.expr("abs(v - med_v)").alias("v"),
        "cnt",
    )
    aggs = [
        F.sum("cnt").alias("n"),
        F.sum(F.expr("cast(v * v as decimal(38,0)) * cnt")).alias("sq"),
    ]
    for i, g in enumerate(ANOVA_GROUPS, 1):
        aggs.append(
            F.sum(
                F.expr(
                    f"case when o_orderpriority = '{g}' then cnt"
                    " else 0 end"
                )
            ).alias(f"n{i}")
        )
        aggs.append(
            F.sum(
                F.expr(
                    f"cast(case when o_orderpriority = '{g}' then v"
                    " else 0 end as decimal(38,0)) * cnt"
                )
            ).alias(f"s{i}")
        )
    return anova_report(z.agg(*aggs))


def _sql_levene() -> str:
    sb, s, k = _anova_fixed_terms()
    cases = ",\n           ".join(
        f"CAST(SUM(CASE WHEN g = '{g}' THEN cnt ELSE 0 END) AS BIGINT)"
        f" AS n{i},\n"
        f"           SUM(CAST(CASE WHEN g = '{g}' THEN v ELSE 0 END"
        f" AS HUGEINT) * cnt) AS s{i}"
        for i, g in enumerate(ANOVA_GROUPS, 1)
    )
    return f"""
  WITH vals0 AS (
    SELECT o_orderpriority AS g,
           CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  grid AS (
    SELECT g, v, COUNT(*) AS cnt FROM vals0 GROUP BY 1, 2
  ),
  tot AS (SELECT g, SUM(cnt) AS n_g FROM grid GROUP BY 1),
  cum AS (
    SELECT g, v, SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS cum
    FROM grid
  ),
  med AS (
    SELECT c.g, MIN(v) AS med_v
    FROM cum c JOIN tot t ON c.g = t.g
    WHERE c.cum >= (t.n_g + 1) // 2
    GROUP BY 1
  ),
  vals AS (
    SELECT grid.g, ABS(v - med_v) AS v, cnt
    FROM grid JOIN med USING (g)
  ),
  agg AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS n,
           SUM(CAST(v AS HUGEINT) * v * cnt) AS sq,
           {cases}
    FROM vals
  ),
  scored AS (
    SELECT n, CAST({k} AS BIGINT) AS k,
           (({sb}) - (({s}) / n) * ({s})) AS ssb,
           ((CAST(sq AS DOUBLE) - (({s}) / n) * ({s}))
            - (({sb}) - (({s}) / n) * ({s}))) AS ssw
    FROM agg
  )
  SELECT n, k, ssb, ssw,
         CASE WHEN k > 1 AND n > k AND ssw > 0.0
              THEN (ssb / (k - 1)) / (ssw / (n - k)) ELSE NULL END AS f_stat
  FROM scored
"""


ORACLE["q_levene"] = _sql_levene()


# -- Welch heteroscedastic ANOVA -----------------------------------------------


def _welch_layers() -> tuple[list[str], list[str], list[str], list[str], list[str]]:
    """The Welch F closure as five SELECT layers of FIXED-ORDER
    expression text, shared verbatim by the Spark selectExpr chain and
    the DuckDB CTE chain (the _anova_fixed_terms convention, layered
    because Welch's weighted grand mean feeds later terms).  Inputs
    are the exact per-group power sums (n_i, s_i, sq_i); every double
    op downstream runs on identical text ⇒ identical IEEE results.

    Group eligibility is structural: a group enters k (and every sum)
    only with n_i > 1 AND positive sample variance — Welch weights
    w_i = n_i/s²_i are undefined otherwise, and the CASE gates zero
    those groups out of every fixed-order chain.
    """
    idx = list(range(1, len(ANOVA_GROUPS) + 1))
    l1: list[str] = ["n"]
    for i in idx:
        var = (
            f"(CAST(sq{i} AS DOUBLE) - (CAST(s{i} AS DOUBLE) / n{i})"
            f" * CAST(s{i} AS DOUBLE))"
        )
        elig = f"(n{i} > 1 AND {var} > 0.0)"
        l1 += [
            f"n{i}",
            f"CAST({elig} AS INT) AS k{i}",
            f"CASE WHEN {elig} THEN (CAST(n{i} AS DOUBLE) * (n{i} - 1))"
            f" / {var} ELSE 0.0 END AS w{i}",
            f"CASE WHEN {elig} THEN CAST(s{i} AS DOUBLE) / n{i}"
            f" ELSE 0.0 END AS m{i}",
        ]
    carry = ["n"] + [c for i in idx for c in (f"n{i}", f"k{i}", f"w{i}", f"m{i}")]
    l2 = carry + [
        "(" + " + ".join(f"k{i}" for i in idx) + ") AS k",
        "(" + " + ".join(f"w{i}" for i in idx) + ") AS sw",
        "(" + " + ".join(f"w{i} * m{i}" for i in idx) + ") AS swm",
    ]
    l3 = carry + [
        "k",
        "sw",
        "CASE WHEN sw > 0.0 THEN swm / sw ELSE 0.0 END AS mbar",
    ]
    l4 = [
        "n",
        "k",
        "sw",
        "("
        + " + ".join(f"w{i} * (m{i} - mbar) * (m{i} - mbar)" for i in idx)
        + ") AS ssb_w",
        "("
        + " + ".join(
            f"(CASE WHEN k{i} = 1 THEN ((1.0 - w{i} / sw)"
            f" * (1.0 - w{i} / sw)) / (n{i} - 1) ELSE 0.0 END)"
            for i in idx
        )
        + ") AS c",
    ]
    l5 = [
        "n",
        "CAST(k AS BIGINT) AS k",
        "CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT)"
        " ELSE CAST(NULL AS BIGINT) END AS df1",
        "CASE WHEN k > 1 THEN (ssb_w / (k - 1))"
        " / (1.0 + (2.0 * (k - 2) * c) / ((CAST(k AS DOUBLE) * k) - 1.0))"
        " ELSE CAST(NULL AS DOUBLE) END AS welch_f",
        "CASE WHEN k > 1 AND c > 0.0"
        " THEN ((CAST(k AS DOUBLE) * k) - 1.0) / (3.0 * c)"
        " ELSE CAST(NULL AS DOUBLE) END AS df2",
    ]
    return l1, l2, l3, l4, l5


def welch_state(orders: DataFrame) -> DataFrame:
    """The 1-row additive Welch state: n plus per-group (n_i, Σv_i,
    Σv_i²) — q_anova's state EXTENDED with per-group sums of squares
    (Welch needs per-group variances, pooled ANOVA only the global
    Σv²).  Every column a plain sum (commutative monoid), so a
    streaming maintainer merges per-batch rows and the F finisher
    closes over the merged row."""
    v = orders.select(
        "o_orderpriority",
        F.expr("cast(floor(o_totalprice + 0.5) as bigint)").alias("v"),
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, g in enumerate(ANOVA_GROUPS, 1):
        aggs += [
            F.sum(
                F.expr(f"case when o_orderpriority = '{g}' then 1 else 0 end")
            ).alias(f"n{i}"),
            F.sum(
                F.expr(
                    f"cast(case when o_orderpriority = '{g}' then v"
                    " else 0 end as decimal(38,0))"
                )
            ).alias(f"s{i}"),
            F.sum(
                F.expr(
                    f"cast(case when o_orderpriority = '{g}' then v * v"
                    " else 0 end as decimal(38,0))"
                )
            ).alias(f"sq{i}"),
        ]
    return v.agg(*aggs)


def welch_report(state: DataFrame) -> DataFrame:
    """Close Welch's F over the exact state via the five shared
    layers (identical text on both engines)."""
    l1, l2, l3, l4, l5 = _welch_layers()
    return (
        state.selectExpr(*l1)
        .selectExpr(*l2)
        .selectExpr(*l3)
        .selectExpr(*l4)
        .selectExpr(*l5)
    )


def q_welch_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's heteroscedasticity-robust one-way ANOVA of order value
    across priorities — the F you run INSTEAD of q_anova when
    q_levene (Brown–Forsythe) rejects variance homogeneity: groups
    weight by n_i/s²_i, so a high-variance group no longer drowns the
    pooled denominator, and df2 comes from the Welch–Satterthwaite
    approximation instead of n−k.

    Exactness: the same whole-dollar bigint values and DECIMAL(38)
    power sums as q_anova, extended per group with Σv² (welch_state);
    the closure is five SELECT layers of fixed-order expression text
    shared verbatim with the DuckDB twin, so F and df2 are bit-stable
    cross-engine.  Scale shape: ONE conditional-aggregate pass over
    orders to a 1-row state (additive monoid — streaming-ready), then
    row-local arithmetic.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    return welch_report(welch_state(load_table(spark, sf_dir, "orders")))


def _sql_welch() -> str:
    l1, l2, l3, l4, l5 = _welch_layers()
    cases = ",\n           ".join(
        f"CAST(SUM(CASE WHEN g = '{g}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i},\n"
        f"           SUM(CASE WHEN g = '{g}' THEN v ELSE 0 END) AS s{i},\n"
        f"           SUM(CASE WHEN g = '{g}' THEN v * v ELSE 0 END) AS sq{i}"
        for i, g in enumerate(ANOVA_GROUPS, 1)
    )
    return f"""
  WITH vals AS (
    SELECT o_orderpriority AS g,
           CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  agg AS (
    SELECT COUNT(*) AS n,
           {cases}
    FROM vals
  ),
  l1 AS (SELECT {", ".join(l1)} FROM agg),
  l2 AS (SELECT {", ".join(l2)} FROM l1),
  l3 AS (SELECT {", ".join(l3)} FROM l2),
  l4 AS (SELECT {", ".join(l4)} FROM l3)
  SELECT {", ".join(l5)} FROM l4
"""


ORACLE["q_welch_anova"] = _sql_welch()


# -- Mood's median test ---------------------------------------------------------


def _moods_layers() -> tuple[list[str], list[str], list[str]]:
    """Mood's median chi-square closure as three SELECT layers of
    fixed-order text shared by both engines.  Inputs: med_v plus the
    per-group above/at-or-below counts (a_i, b_i) — all exact
    bigints; the expected-cell and chi-square terms are the only
    doubles and run on identical text."""
    idx = list(range(1, len(ANOVA_GROUPS) + 1))
    carry = ["med_v"] + [c for i in idx for c in (f"a{i}", f"b{i}")]
    l1 = carry + [
        "(" + " + ".join(f"a{i}" for i in idx) + ") AS aa",
        "(" + " + ".join(f"b{i}" for i in idx) + ") AS bb",
        "("
        + " + ".join(f"CAST(a{i} + b{i} > 0 AS INT)" for i in idx)
        + ") AS k",
    ]
    l2 = carry + ["aa", "bb", "k", "(aa + bb) AS n"]
    for i in idx:
        gate = f"a{i} + b{i} > 0 AND aa > 0 AND bb > 0"
        l2 += [
            f"CASE WHEN {gate} THEN (CAST(a{i} + b{i} AS DOUBLE) * aa)"
            f" / (aa + bb) ELSE 0.0 END AS ea{i}",
            f"CASE WHEN {gate} THEN (CAST(a{i} + b{i} AS DOUBLE) * bb)"
            f" / (aa + bb) ELSE 0.0 END AS eb{i}",
        ]
    chi_terms = " + ".join(
        f"(CASE WHEN ea{i} > 0.0 THEN ((CAST(a{i} AS DOUBLE) - ea{i})"
        f" * (CAST(a{i} AS DOUBLE) - ea{i})) / ea{i} ELSE 0.0 END)"
        f" + (CASE WHEN eb{i} > 0.0 THEN ((CAST(b{i} AS DOUBLE) - eb{i})"
        f" * (CAST(b{i} AS DOUBLE) - eb{i})) / eb{i} ELSE 0.0 END)"
        for i in idx
    )
    l3 = [
        "med_v",
        "CAST(n AS BIGINT) AS n",
        "CAST(aa AS BIGINT) AS n_above",
        "CAST(k AS BIGINT) AS k",
        "CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT)"
        " ELSE CAST(NULL AS BIGINT) END AS df",
        f"CASE WHEN k > 1 AND aa > 0 AND bb > 0 THEN ({chi_terms})"
        " ELSE CAST(NULL AS DOUBLE) END AS chi2",
    ]
    return l1, l2, l3


def q_moods_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test of order value across priorities — the
    crudest, most outlier-proof member of the k-sample family next to
    q_kruskal_wallis (ranks) and q_anova/q_welch_anova (moments): does
    each priority put the same share of orders above the GRAND median?
    Counts above/at-or-below the global median form a k×2 contingency
    table; chi² with k−1 df.  SciPy's ``median_test`` convention with
    ties in the at-or-below row.

    Exactness + shape: the q_levene value grid verbatim (bounded by
    \\|priorities\\|·\\|whole-dollar values\\| regardless of volume), its
    global median via ONE exact distributed prefix sum over the
    value-collapsed grid (operators.ranking.global_running_sum — no
    one-partition window), per-group above/below counts as ONE
    grid-sized conditional aggregate to a 1-row state, and a chi²
    closure in fixed-order text shared with the DuckDB twin.  The
    oracle affords a plain window cumsum — engine-local device choice,
    identical median by construction.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    from locopy_spark.functions.cache import managed_persist

    return moods_report(
        managed_persist(
            levene_state(load_table(spark, sf_dir, "orders")), "moods_grid"
        )
    )


def moods_report(grid: DataFrame) -> DataFrame:
    """Close Mood's median test over any (o_orderpriority, v, cnt)
    grid — the q_levene grid monoid verbatim, so a streaming
    maintainer (stream_moods) merges grids and this finisher runs at
    read time (the grand median, hence every cell, keeps moving; only
    the grid is a monoid)."""
    from locopy_spark.operators.ranking import global_running_sum

    vgrid = grid.groupBy("v").agg(F.sum("cnt").alias("cv"))
    # bounded arm (r12): vgrid is the WHOLE-DOLLAR value histogram —
    # <= |price domain| (~6e5) rows at any volume, so one plain window
    # beats the range device's sampler job (A/B: 2.3 -> 1.6 s).
    run = global_running_sum(
        vgrid, ["v"], "cv", out_col="cum_ex", bounded=True
    )
    tot = vgrid.agg(F.sum("cv").alias("n_tot"))
    med = (
        run.crossJoin(F.broadcast(tot))
        .filter("cum_ex + cv >= (n_tot + 1) div 2")
        .agg(F.min("v").alias("med_v"))
    )
    aggs = [F.max("med_v").alias("med_v")]
    for i, g in enumerate(ANOVA_GROUPS, 1):
        aggs += [
            F.sum(
                F.expr(
                    f"case when o_orderpriority = '{g}' and v > med_v"
                    " then cnt else 0 end"
                )
            ).alias(f"a{i}"),
            F.sum(
                F.expr(
                    f"case when o_orderpriority = '{g}' and v <= med_v"
                    " then cnt else 0 end"
                )
            ).alias(f"b{i}"),
        ]
    state = grid.crossJoin(F.broadcast(med)).agg(*aggs)
    l1, l2, l3 = _moods_layers()
    return state.selectExpr(*l1).selectExpr(*l2).selectExpr(*l3)


def _sql_moods() -> str:
    l1, l2, l3 = _moods_layers()
    cases = ",\n           ".join(
        f"CAST(SUM(CASE WHEN g = '{g}' AND v > med_v THEN cnt ELSE 0 END)"
        f" AS BIGINT) AS a{i},\n"
        f"           CAST(SUM(CASE WHEN g = '{g}' AND v <= med_v"
        f" THEN cnt ELSE 0 END) AS BIGINT) AS b{i}"
        for i, g in enumerate(ANOVA_GROUPS, 1)
    )
    return f"""
  WITH vals0 AS (
    SELECT o_orderpriority AS g,
           CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  grid AS (SELECT g, v, COUNT(*) AS cnt FROM vals0 GROUP BY 1, 2),
  vgrid AS (SELECT v, SUM(cnt) AS cv FROM grid GROUP BY 1),
  cum AS (
    SELECT v, cv, SUM(cv) OVER (ORDER BY v) AS cum_in FROM vgrid
  ),
  tot AS (SELECT SUM(cv) AS n_tot FROM vgrid),
  med AS (
    SELECT MIN(v) AS med_v FROM cum, tot
    WHERE cum_in >= (n_tot + 1) // 2
  ),
  st AS (
    SELECT MAX(med_v) AS med_v,
           {cases}
    FROM grid, med
  ),
  l1 AS (SELECT {", ".join(l1)} FROM st),
  l2 AS (SELECT {", ".join(l2)} FROM l1)
  SELECT {", ".join(l3)} FROM l2
"""


ORACLE["q_moods_median"] = _sql_moods()


# -- weekly seasonality strength -----------------------------------------------


def q_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality strength of daily revenue: η² = SSB/SST with
    day-of-week as the grouping — the one-scalar answer to "how much
    of daily revenue variation is just the weekly clock" that decides
    whether q_seasonal_decompose's profile is worth subtracting before
    trend work (η² near 0: don't bother; near 1: raw dailies are
    mostly calendar echo).

    The q_anova device verbatim, pointed at the |days|-bounded daily
    aggregate: exact scaled-cent revenue per day, DOW = (epoch_day+4)%7
    pure integer (the q_dow_revenue convention), per-DOW DECIMAL(38)
    power sums pivoted to ONE row, SSB/SST as fixed-order seven-term
    double chains (identical text both engines), η² in exact-operand
    double. Two bounded aggregates past the one data-sized scan.
    Split as state + finisher since r8: the input IS the shared
    ``peaks_state`` daily-revenue monoid (``stream_peaks`` maintains
    it live - this is its FOURTH finisher)."""
    from locopy_spark.queries.timeseries import peaks_state

    return seasonal_strength_report(
        peaks_state(load_table(spark, sf_dir, "orders"))
    )


def seasonal_strength_report(state: DataFrame) -> DataFrame:
    """Close weekly eta-squared over any (day, rev_c) daily-revenue
    state."""
    daily = state.select(
        F.expr("(day + 4) % 7").alias("dow"), F.col("rev_c").alias("v")
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("cast(v as decimal(38,0)) * v")).alias("sq"),
    ]
    for i in range(7):
        aggs.append(
            F.sum(F.expr(f"case when dow = {i} then 1 else 0 end")).alias(
                f"n{i + 1}"
            )
        )
        aggs.append(
            F.sum(
                F.expr(
                    f"cast(case when dow = {i} then v else 0 end"
                    " as decimal(38,0))"
                )
            ).alias(f"s{i + 1}")
        )
    sb = " + ".join(
        f"(CASE WHEN n{i} > 0 THEN (CAST(s{i} AS DOUBLE) / n{i})"
        f" * CAST(s{i} AS DOUBLE) ELSE 0.0 END)"
        for i in range(1, 8)
    )
    s = " + ".join(f"CAST(s{i} AS DOUBLE)" for i in range(1, 8))
    return daily.agg(*aggs).selectExpr(
        "n AS n_days",
        f"(({sb}) - (({s}) / n) * ({s})) AS ssb",
        f"(CAST(sq AS DOUBLE) - (({s}) / n) * ({s})) AS sst",
        f"CASE WHEN (CAST(sq AS DOUBLE) - (({s}) / n) * ({s})) > 0.0"
        f" THEN (({sb}) - (({s}) / n) * ({s}))"
        f" / (CAST(sq AS DOUBLE) - (({s}) / n) * ({s}))"
        " ELSE NULL END AS eta2",
    )


def _sql_seasonal_strength() -> str:
    sb = " + ".join(
        f"(CASE WHEN n{i} > 0 THEN (CAST(s{i} AS DOUBLE) / n{i})"
        f" * CAST(s{i} AS DOUBLE) ELSE 0.0 END)"
        for i in range(1, 8)
    )
    s = " + ".join(f"CAST(s{i} AS DOUBLE)" for i in range(1, 8))
    cases = ",\n           ".join(
        f"CAST(SUM(CASE WHEN dow = {i} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n{i + 1},\n"
        f"           SUM(CASE WHEN dow = {i} THEN v ELSE 0 END) AS s{i + 1}"
        for i in range(7)
    )
    return f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
             AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS v
    FROM orders GROUP BY 1
  ),
  d AS (SELECT (day + 4) % 7 AS dow, v FROM daily),
  agg AS (
    SELECT COUNT(*) AS n, SUM(CAST(v AS HUGEINT) * v) AS sq,
           {cases}
    FROM d
  )
  SELECT CAST(n AS BIGINT) AS n_days,
         (({sb}) - (({s}) / n) * ({s})) AS ssb,
         (CAST(sq AS DOUBLE) - (({s}) / n) * ({s})) AS sst,
         CASE WHEN (CAST(sq AS DOUBLE) - (({s}) / n) * ({s})) > 0.0
              THEN (({sb}) - (({s}) / n) * ({s}))
              / (CAST(sq AS DOUBLE) - (({s}) / n) * ({s}))
              ELSE NULL END AS eta2
  FROM agg
"""


ORACLE["q_seasonal_strength"] = _sql_seasonal_strength()


# -- brand substitution / cannibalization matrix -----------------------------------

BX_R_CUT = 0.2  # |r| threshold for the substitute/complement call


def q_brand_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-pair demand correlation (cannibalization matrix): Pearson
    r between every two brands' ZERO-FILLED monthly quantity series —
    the assortment read behind "does brand A eat brand B's demand"
    (persistently negative r: substitutes — promoting one moves the
    other; positive: complements/common seasonality). q_xcorr answers
    this for two fixed event series at many lags; this answers it at
    lag 0 for every brand pair.

    Exactness: the (brand, month) grid carries exact integer
    quantities; missing months ZERO-FILL from the broadcast
    brand×month spine (a brand absent in a month is real zero demand
    — dropping the month would bias r toward +1); the pair join is a
    month-aligned self-equi-join of the bounded grid; per-pair
    DECIMAL(38) power sums close through the shared _CORR fixed
    formula text (identical on both engines), zero-variance pairs
    NULL. Scale shape: one partial-aggregated fact scan with a
    broadcast part join; everything after runs on the
    |brands × months| grid and the |brands|²/2 pair table.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    from locopy_spark.queries.tpch_ext import abc_xyz_state

    return brand_xcorr_report(
        abc_xyz_state(load_table(spark, sf_dir, "lineitem")),
        load_table(spark, sf_dir, "part"),
    )


def brand_xcorr_report(state: DataFrame, part: DataFrame) -> DataFrame:
    """Close the cannibalization matrix over any (l_partkey, ym, q, r)
    demand grid plus the static part dim — FIFTH finisher on the
    shared ``abc_xyz_state`` (the brand grid is the part grid rolled
    up through the dim, so sums of sums reproduce the direct scan
    exactly)."""
    grid = (
        state.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            state["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand", "ym")
        .agg(F.sum("q").alias("q"))
    )
    brands = grid.select("p_brand").distinct()
    months = grid.select("ym").distinct()
    spine = brands.crossJoin(F.broadcast(months))
    # broadcast hints (r12, §3.1): grid and filled are |brands×months|-
    # bounded at any volume, but their size ESTIMATES (derived through
    # the fact-scan aggregate) kept both joins sort-merge — 3 SMJs in
    # the plan for joins whose build sides are a few thousand rows.
    filled = spine.join(F.broadcast(grid), ["p_brand", "ym"], "left").select(
        "p_brand", "ym", F.expr("coalesce(q, 0)").alias("q")
    )
    a, b = filled.alias("a"), filled.alias("b")
    sums = (
        a.join(F.broadcast(b), F.expr("a.ym = b.ym AND a.p_brand < b.p_brand"))
        .select(
            F.expr("a.p_brand").alias("brand_a"),
            F.expr("b.p_brand").alias("brand_b"),
            F.expr("a.q").alias("x"),
            F.expr("b.q").alias("y"),
        )
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("cast(x as decimal(38,0))")).alias("sx"),
            F.sum(F.expr("cast(y as decimal(38,0))")).alias("sy"),
            F.sum(F.expr("cast(x * y as decimal(38,0))")).alias("sxy"),
            F.sum(F.expr("cast(x * x as decimal(38,0))")).alias("sx2"),
            F.sum(F.expr("cast(y * y as decimal(38,0))")).alias("sy2"),
        )
    )
    fmt = dict(n="n", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2")
    guarded = (
        "CASE WHEN n * CAST(sx2 AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0"
        " AND n * CAST(sy2 AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0"
        f" THEN {_CORR.format(**fmt)} END"
    )
    return (
        sums.select(
            "brand_a",
            "brand_b",
            F.col("n").alias("n_months"),
            F.expr(guarded).alias("r"),
        )
        .withColumn(
            "relation",
            F.expr(
                f"CASE WHEN r < -{BX_R_CUT} THEN 'substitute'"
                f" WHEN r > {BX_R_CUT} THEN 'complement'"
                " WHEN r IS NULL THEN 'flat' ELSE 'independent' END"
            ),
        )
        .orderBy("brand_a", "brand_b")
    )


def _sql_brand_xcorr() -> str:
    fmt = dict(n="n", sx="sx", sy="sy", sxy="sxy", sx2="sx2", sy2="sy2")
    corr = _CORR.format(**fmt)
    return f"""
  WITH grid AS (
    SELECT p_brand,
           year(CAST(l_shipdate AS DATE)) * 100
             + month(CAST(l_shipdate AS DATE)) AS ym,
           SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS q
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
  ),
  spine AS (
    SELECT b.p_brand, m.ym
    FROM (SELECT DISTINCT p_brand FROM grid) b,
         (SELECT DISTINCT ym FROM grid) m
  ),
  filled AS (
    SELECT s.p_brand, s.ym, COALESCE(g.q, 0) AS q
    FROM spine s LEFT JOIN grid g
      ON g.p_brand = s.p_brand AND g.ym = s.ym
  ),
  sums AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CAST(a.q AS HUGEINT)) AS sx,
           SUM(CAST(b.q AS HUGEINT)) AS sy,
           SUM(CAST(a.q AS HUGEINT) * b.q) AS sxy,
           SUM(CAST(a.q AS HUGEINT) * a.q) AS sx2,
           SUM(CAST(b.q AS HUGEINT) * b.q) AS sy2
    FROM filled a JOIN filled b
      ON a.ym = b.ym AND a.p_brand < b.p_brand
    GROUP BY 1, 2
  ),
  scored AS (
    SELECT brand_a, brand_b, n AS n_months,
           CASE WHEN n * CAST(sx2 AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
                AND n * CAST(sy2 AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
                THEN {corr} END AS r
    FROM sums
  )
  SELECT brand_a, brand_b, n_months, r,
         CASE WHEN r < -{BX_R_CUT} THEN 'substitute'
              WHEN r > {BX_R_CUT} THEN 'complement'
              WHEN r IS NULL THEN 'flat' ELSE 'independent' END AS relation
  FROM scored ORDER BY brand_a, brand_b
"""


ORACLE["q_brand_xcorr"] = _sql_brand_xcorr()


# -- Friedman rank test --------------------------------------------------------------


def q_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: blocking monthly shipped revenue by ship
    month, do the order PRIORITIES differ systematically? The
    nonparametric repeated-measures companion to
    q_anova/q_kruskal_wallis — months are blocks (absorbing
    seasonality and volume drift), priorities are treatments, and only
    the within-month RANKING of priority revenues enters the
    statistic, so one huge month can't dominate.

    Scale shape: all data-sized work is the ONE |lineitem| join + the
    partial-aggregated groupBy of ``tpch_ext.sla_state`` down to the
    |months|·|priorities| grid (the same additive state stream_sla
    maintains live); ranking runs per-month over k-row bounded
    partitions, never over raw lines. Exactness: tie-averaged ranks
    are kept in integer HALF-units (r2 = 2·rank + ties − 1 = 2·avg
    rank), per-mode sums and their squares are exact bigints, and the
    single final double Q = 3·ΣR2_j²/(n·k·(k+1)) − 3·n·(k+1) is
    byte-identical on both engines (no tie-correction denominator —
    documented, consistent across engines, negligible for continuous
    revenue totals). Only COMPLETE blocks (all k modes present) are
    scored, per the test's definition.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    from locopy_spark.queries.tpch_ext import sla_state

    return friedman_report(
        sla_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        )
    )


def friedman_report(state: DataFrame) -> DataFrame:
    """Close the Friedman panel over any (ym, prio, ..., rev_c) grid.

    The grid is persisted before fan-out: THREE subtrees (the k
    scalar, the complete-block filter, and the ranked pass) consume
    it, and without the persist each analyzed subtree re-expands the
    data-sized grid build — one |lineitem| pass instead of three."""
    from pyspark.sql.window import Window as W

    from locopy_spark.functions.cache import managed_persist

    state = managed_persist(state, "friedman_grid")
    k_df = state.agg(
        F.countDistinct("prio").alias("k")
    )
    sized = (
        state.groupBy("ym")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(k_df), F.col("cnt") == F.col("k"))
        .select("ym", "k")
    )
    # broadcast hint (r12, §3.1): sized is |months|-bounded but its
    # estimate (through the persisted grid) kept the join sort-merge
    complete = state.join(F.broadcast(sized), "ym")
    ranked = complete.select(
        "prio",
        "k",
        (
            2 * F.rank().over(W.partitionBy("ym").orderBy("rev_c"))
            + F.count(F.lit(1)).over(W.partitionBy("ym", "rev_c"))
            - 1
        ).alias("r2"),
    )
    per_mode = ranked.groupBy("prio", "k").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("r2").alias("r2_sum"),
    )
    scalar = per_mode.groupBy("k").agg(
        F.max("n_blocks").alias("n"),
        F.sum(F.expr("r2_sum * r2_sum")).alias("ssq"),
    ).selectExpr(
        "3.0 * CAST(ssq AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * k * (k + 1))"
        " - 3.0 * CAST(n AS DOUBLE) * (k + 1) AS q_stat",
    )
    return (
        per_mode.crossJoin(F.broadcast(scalar))
        .selectExpr(
            "prio",
            "CAST(k AS BIGINT) AS k_groups",
            "n_blocks",
            "r2_sum",
            "q_stat",
        )
        .orderBy("prio")
    )


ORACLE["q_friedman"] = f"""
  WITH grid AS (
    SELECT year(CAST(l_shipdate AS DATE)) * 100
             + month(CAST(l_shipdate AS DATE)) AS ym,
           o_orderpriority AS prio,
           CAST(SUM(CAST(FLOOR(l_extendedprice * {{SCALE}} + 0.5)
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
  ),
  kk AS (SELECT COUNT(DISTINCT prio) AS k FROM grid),
  complete AS (
    SELECT g.ym, g.prio, g.rev_c, kk.k
    FROM grid g, kk
    WHERE g.ym IN (
      SELECT ym FROM grid GROUP BY ym
      HAVING COUNT(*) = (SELECT k FROM kk)
    )
  ),
  ranked AS (
    SELECT prio, k,
           2 * RANK() OVER (PARTITION BY ym ORDER BY rev_c)
             + COUNT(*) OVER (PARTITION BY ym, rev_c) - 1 AS r2
    FROM complete
  ),
  per_mode AS (
    SELECT prio, k, COUNT(*) AS n_blocks,
           CAST(SUM(r2) AS BIGINT) AS r2_sum
    FROM ranked GROUP BY 1, 2
  ),
  scalar AS (
    SELECT 3.0 * CAST(SUM(CAST(r2_sum AS HUGEINT) * r2_sum) AS DOUBLE)
             / (CAST(MAX(n_blocks) AS DOUBLE) * k * (k + 1))
           - 3.0 * CAST(MAX(n_blocks) AS DOUBLE) * (k + 1) AS q_stat
    FROM per_mode GROUP BY k
  )
  SELECT prio, CAST(k AS BIGINT) AS k_groups, n_blocks, r2_sum, q_stat
  FROM per_mode, scalar
  ORDER BY prio
"""
ORACLE["q_friedman"] = ORACLE["q_friedman"].replace("{SCALE}", str(SCALE))


# -- Cliff's delta effect size -------------------------------------------------------


def q_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff's delta ordinal effect size between the q_ks_test /
    q_mann_whitney segment pair ({KS_SEG_A} vs {KS_SEG_B} order
    values): δ = P(a > b) − P(a < b) — the MAGNITUDE companion the
    significance tests need (at 100 TB every U test is "significant";
    δ says whether the shift is big enough to matter, and unlike
    Cohen's d it assumes nothing about the distributions).

    Scale shape: the same per-value grid + ONE range-partitioned
    exclusive prefix sum as q_mann_whitney (value domain bounded by
    distinct order totals, never a pairwise join); the pair counts
    close by the identity #(a<b) = n_a·n_b − #(a>b) − #(a=b), so ONE
    prefix pass suffices: #(a>b) = Σ_v d_a(v)·cum_b(<v), #(a=b) =
    Σ_v d_a(v)·d_b(v) — exact DECIMAL(38)/HUGEINT bigints. δ closes
    as the single byte-identical double (2·gt + eq − n_a·n_b)/(n_a·n_b)
    (no signed floor division anywhere — Spark ``div`` truncates
    toward zero while DuckDB ``//`` floors, so a negative δ would
    diverge in fixed point; the double form is portable).

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    return cliffs_report(
        cliffs_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )
    )


def cliffs_state(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The per-value segment grid ``(v, d_a, d_b)``: counts of each
    segment's order totals at each exact cent value — both plain-sum
    monoids (late chunks add in), bounded by |distinct totals|
    regardless of order volume. Shared by ``q_cliffs_delta`` and
    ``streaming.stateful.stream_cliffs``."""
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    vals = orders.join(
        customer.filter(
            F.col("c_mktsegment").isin([KS_SEG_A, KS_SEG_B])
        ).select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
        "o_custkey",
    ).select(v.alias("v"), (F.col("c_mktsegment") == KS_SEG_A).alias("is_a"))
    return vals.groupBy("v").agg(
        F.sum(F.expr("cast(is_a as bigint)")).alias("d_a"),
        F.sum(F.expr("cast(not is_a as bigint)")).alias("d_b"),
    )


def cliffs_report(g: DataFrame) -> DataFrame:
    """Close the effect-size panel over any (v, d_a, d_b) grid."""
    from locopy_spark.operators.ranking import global_running_sum

    cum = global_running_sum(g, order_cols=["v"], value_col="d_b",
                             out_col="pre_b")
    return cum.agg(
        F.sum("d_a").alias("n_a"),
        F.sum("d_b").alias("n_b"),
        F.sum(
            F.expr("CAST(d_a AS DECIMAL(38,0)) * pre_b")
        ).alias("n_gt"),
        F.sum(
            F.expr("CAST(d_a AS DECIMAL(38,0)) * d_b")
        ).alias("n_eq"),
    ).selectExpr(
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        "CAST(n_gt AS BIGINT) AS n_gt",
        "CAST(n_eq AS BIGINT) AS n_eq",
        # one-segment-empty (possible mid-stream): NULL, not an ANSI
        # divide-by-zero crash
        "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE"
        " (CAST(n_gt AS DOUBLE) * 2 + CAST(n_eq AS DOUBLE)"
        " - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))"
        " / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) END"
        " AS cliffs_delta",
    )


ORACLE["q_cliffs_delta"] = f"""
  WITH vals AS (
    SELECT CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v,
           (c_mktsegment = '{KS_SEG_A}') AS is_a
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('{KS_SEG_A}', '{KS_SEG_B}')
  ),
  g AS (
    SELECT v, CAST(SUM(CAST(is_a AS BIGINT)) AS BIGINT) AS d_a,
           CAST(SUM(CAST(NOT is_a AS BIGINT)) AS BIGINT) AS d_b
    FROM vals GROUP BY 1
  ),
  cum AS (
    SELECT v, d_a, d_b,
           CAST(COALESCE(SUM(d_b) OVER (
             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS pre_b
    FROM g
  ),
  agg AS (
    SELECT CAST(SUM(d_a) AS BIGINT) AS n_a,
           CAST(SUM(d_b) AS BIGINT) AS n_b,
           CAST(SUM(CAST(d_a AS HUGEINT) * pre_b) AS BIGINT) AS n_gt,
           CAST(SUM(CAST(d_a AS HUGEINT) * d_b) AS BIGINT) AS n_eq
    FROM cum
  )
  SELECT n_a, n_b, n_gt, n_eq,
         CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
           (CAST(n_gt AS DOUBLE) * 2 + CAST(n_eq AS DOUBLE)
            - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
         END AS cliffs_delta
  FROM agg
"""


# -- post-hoc pairwise comparisons (third finisher on the ANOVA state) ---------

# Bonferroni-corrected critical value: α = 0.05 two-sided over the
# C(5,2) = 10 priority pairs → z_{1 − 0.05/20}, embedded as ONE
# literal (statistics.NormalDist().inv_cdf(0.9975)) so both engines
# compare against the identical constant — no erf/quantile calls in
# either engine.
POSTHOC_Z_CRIT = "2.8070337683438114"


def q_posthoc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-hoc pairwise mean comparisons across order priorities —
    the question a significant q_anova F immediately raises (WHICH
    priorities differ?), answered with Bonferroni-corrected z tests
    that reuse ANOVA's pooled within-group variance (MSW), the
    textbook Fisher-LSD-with-correction panel.

    ANOTHER finisher on the SAME 1-row ``anova_state`` power-sum
    aggregate (stream_anova maintains it live): the data-sized work
    is that one conditional-aggregate pass, already priced; this
    closure fans the row out to the C(5,2)=10 bounded pair rows
    row-locally (explode over a literal struct array — no shuffle,
    no join).  MSW closes over the fixed-order five-term chains (the
    q_anova device); each pair's z = Δmean/√(MSW·(1/n_a+1/n_b)) is a
    fixed-text double over exact integers; degenerate states (empty
    group, zero MSW — possible mid-stream) yield NULL z, never an
    ANSI divide crash.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    o = load_table(spark, sf_dir, "orders")
    return posthoc_report(anova_state(o))


def posthoc_report(state: DataFrame) -> DataFrame:
    """Close the pairwise panel over the 1-row ANOVA state."""
    sb, s, k = _anova_fixed_terms()
    scored = state.selectExpr(
        "*",
        f"((CAST(sq AS DOUBLE) - (({s}) / n) * ({s}))"
        f" - (({sb}) - (({s}) / n) * ({s}))) AS ssw",
        f"CAST({k} AS BIGINT) AS k",
    ).selectExpr(
        "*",
        "CASE WHEN n > k THEN ssw / (n - k) ELSE NULL END AS msw",
    )
    pairs = ", ".join(
        f"struct('{ga}' AS g_a, '{gb}' AS g_b,"
        f" n{i} AS n_a, n{j} AS n_b,"
        f" CAST(s{i} AS BIGINT) AS s_a, CAST(s{j} AS BIGINT) AS s_b)"
        for i, ga in enumerate(ANOVA_GROUPS, 1)
        for j, gb in enumerate(ANOVA_GROUPS, 1)
        if i < j
    )
    exploded = scored.selectExpr(
        "msw", f"explode(array({pairs})) AS p"
    ).selectExpr("msw", "p.*")
    return exploded.selectExpr(
        "g_a", "g_b", "n_a", "n_b", "s_a", "s_b",
        "CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE"
        " CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_diff",
        "CASE WHEN n_a = 0 OR n_b = 0 OR msw IS NULL OR msw <= 0.0"
        " THEN NULL ELSE"
        " (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / sqrt(msw * (1.0 / CAST(n_a AS DOUBLE)"
        " + 1.0 / CAST(n_b AS DOUBLE))) END AS z_pair",
        "CASE WHEN n_a = 0 OR n_b = 0 OR msw IS NULL OR msw <= 0.0"
        " THEN NULL ELSE"
        " ABS((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)"
        " - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))"
        " / sqrt(msw * (1.0 / CAST(n_a AS DOUBLE)"
        f" + 1.0 / CAST(n_b AS DOUBLE)))) > {POSTHOC_Z_CRIT}"
        " END AS reject_bonf",
    ).orderBy("g_a", "g_b")


def _sql_posthoc() -> str:
    sb, s, k = _anova_fixed_terms()
    cases = ",\n           ".join(
        f"CAST(SUM(CASE WHEN g = '{g}' THEN 1 ELSE 0 END) AS BIGINT) AS n{i},\n"
        f"           SUM(CASE WHEN g = '{g}' THEN v ELSE 0 END) AS s{i}"
        for i, g in enumerate(ANOVA_GROUPS, 1)
    )
    pairs = ", ".join(
        f"{{'g_a': '{ga}', 'g_b': '{gb}',"
        f" 'n_a': n{i}, 'n_b': n{j},"
        f" 's_a': CAST(s{i} AS BIGINT), 's_b': CAST(s{j} AS BIGINT)}}"
        for i, ga in enumerate(ANOVA_GROUPS, 1)
        for j, gb in enumerate(ANOVA_GROUPS, 1)
        if i < j
    )
    return f"""
  WITH vals AS (
    SELECT o_orderpriority AS g,
           CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  agg AS (
    SELECT COUNT(*) AS n, SUM(v * v) AS sq,
           {cases}
    FROM vals
  ),
  scored AS (
    SELECT *,
           ((CAST(sq AS DOUBLE) - (({s}) / n) * ({s}))
            - (({sb}) - (({s}) / n) * ({s}))) AS ssw,
           CAST({k} AS BIGINT) AS k
    FROM agg
  ),
  mswed AS (
    SELECT *,
           CASE WHEN n > k THEN ssw / (n - k) ELSE NULL END AS msw
    FROM scored
  ),
  exploded AS (
    SELECT msw, UNNEST([{pairs}], recursive := true)
    FROM mswed
  )
  SELECT g_a, g_b, n_a, n_b, s_a, s_b,
         CASE WHEN n_a = 0 OR n_b = 0 THEN NULL ELSE
           CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) END AS mean_diff,
         CASE WHEN n_a = 0 OR n_b = 0 OR msw IS NULL OR msw <= 0.0
           THEN NULL ELSE
           (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt(msw * (1.0 / CAST(n_a AS DOUBLE)
           + 1.0 / CAST(n_b AS DOUBLE))) END AS z_pair,
         CASE WHEN n_a = 0 OR n_b = 0 OR msw IS NULL OR msw <= 0.0
           THEN NULL ELSE
           ABS((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
           - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
           / sqrt(msw * (1.0 / CAST(n_a AS DOUBLE)
           + 1.0 / CAST(n_b AS DOUBLE)))) > {POSTHOC_Z_CRIT}
         END AS reject_bonf
  FROM exploded ORDER BY g_a, g_b
"""


ORACLE["q_posthoc_pairs"] = _sql_posthoc()


# -- Jarque-Bera normality panel ------------------------------------------------------

# chi-square(2) 0.95 quantile — the JB rejection bound, a shared
# literal in both engines
_JB_CRIT_95 = "5.991464547107979"


def _jb_close_exprs() -> dict[str, str]:
    """The shared close: central moments, skewness, excess kurtosis and
    JB from the exact raw power sums (n, s1..s4) — ONE double
    expression per output with IDENTICAL text on both engines, so the
    IEEE operation order (and therefore every bit) matches.  The
    zero-variance guard is exact integer cross-multiplication
    (n·s2 > s1²) — a constant group yields NULLs, never Inf/NaN."""
    mean = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    m2 = f"(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - {mean} * {mean})"
    m3 = (
        f"(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - 3.0 * {mean} * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
        f" + 2.0 * {mean} * {mean} * {mean})"
    )
    m4 = (
        f"(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - 4.0 * {mean} * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
        f" + 6.0 * {mean} * {mean} * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
        f" - 3.0 * {mean} * {mean} * {mean} * {mean})"
    )
    guard = "CAST(n AS DECIMAL(38,0)) * s2 > CAST(s1 AS DECIMAL(38,0)) * s1"
    skew = f"({m3} / sqrt({m2} * {m2} * {m2}))"
    kurt = f"({m4} / ({m2} * {m2}) - 3.0)"
    jb = (
        f"(CAST(n AS DOUBLE) / 6.0"
        f" * ({skew} * {skew} + {kurt} * {kurt} / 4.0))"
    )
    return {
        "skew": f"CASE WHEN {guard} THEN {skew} END",
        "kurt_excess": f"CASE WHEN {guard} THEN {kurt} END",
        "jb": f"CASE WHEN {guard} THEN {jb} END",
        "reject_95": f"CASE WHEN {guard} THEN {jb} > {_JB_CRIT_95} END",
    }


def q_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of order values per priority — the
    distribution-shape guard that complements q_levene's spread
    check in front of q_anova (the F test assumes within-group
    normality; JB tests exactly that via sample skewness and excess
    kurtosis: JB = n/6·(S² + K²/4) ~ chi-square(2) under normality).

    Exactness & streaming: FOURTH consumer of the shared (priority,
    whole-dollar value) grid ``levene_state`` (a plain-sum monoid
    bounded by the value domain; ``stream_jarque_bera`` maintains it
    live) — raw power sums s1..s4 are cnt-weighted exact
    DECIMAL(38)/HUGEINT grid sums (v ≤ 10⁶ dollars keeps v⁴·rows
    < 10³⁸ beyond 10¹³ orders), and every double output closes as
    one shared expression over those exact integers (identical text
    both engines — bit-for-bit).  A constant group yields NULLs via
    the exact integer variance guard, never an IEEE Inf.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family
    (stats.py:q_anova / q_levene / q_stats_moments).
    """
    return jb_report(levene_state(load_table(spark, sf_dir, "orders")))


def jb_report(grid: DataFrame) -> DataFrame:
    """Close the per-priority JB panel over any (o_orderpriority, v,
    cnt) grid — one grid-sized aggregate to |priorities| rows of
    exact power sums, then row-local shared double expressions."""
    close = _jb_close_exprs()
    sums = grid.groupBy("o_orderpriority").agg(
        F.expr("CAST(SUM(cnt) AS BIGINT)").alias("n"),
        F.expr("SUM(CAST(v AS DECIMAL(38,0)) * cnt)").alias("s1"),
        F.expr(
            "SUM(CAST(v AS DECIMAL(38,0)) * v * cnt)"
        ).alias("s2"),
        F.expr(
            "SUM(CAST(v AS DECIMAL(38,0)) * v * v * cnt)"
        ).alias("s3"),
        F.expr(
            "SUM(CAST(v AS DECIMAL(38,0)) * v * v * v * cnt)"
        ).alias("s4"),
    )
    return sums.select(
        "o_orderpriority",
        "n",
        F.expr(close["skew"]).alias("skew"),
        F.expr(close["kurt_excess"]).alias("kurt_excess"),
        F.expr(close["jb"]).alias("jb"),
        F.expr(close["reject_95"]).alias("reject_95"),
    ).orderBy("o_orderpriority")


def _sql_jarque_bera() -> str:
    close = _jb_close_exprs()
    return f"""
  WITH vals0 AS (
    SELECT o_orderpriority,
           CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
    FROM orders
  ),
  grid AS (
    SELECT o_orderpriority, v, COUNT(*) AS cnt FROM vals0 GROUP BY 1, 2
  ),
  sums AS (
    SELECT o_orderpriority,
           CAST(SUM(cnt) AS BIGINT) AS n,
           SUM(CAST(v AS HUGEINT) * cnt) AS s1,
           SUM(CAST(v AS HUGEINT) * v * cnt) AS s2,
           SUM(CAST(v AS HUGEINT) * v * v * cnt) AS s3,
           SUM(CAST(v AS HUGEINT) * v * v * v * cnt) AS s4
    FROM grid GROUP BY 1
  )
  SELECT o_orderpriority, n,
         {close["skew"].replace("DECIMAL(38,0)", "HUGEINT")} AS skew,
         {close["kurt_excess"].replace("DECIMAL(38,0)", "HUGEINT")} AS kurt_excess,
         {close["jb"].replace("DECIMAL(38,0)", "HUGEINT")} AS jb,
         {close["reject_95"].replace("DECIMAL(38,0)", "HUGEINT")} AS reject_95
  FROM sums ORDER BY o_orderpriority
"""


ORACLE["q_jarque_bera"] = _sql_jarque_bera()
