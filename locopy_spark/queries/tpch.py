"""TPC-H-style analytical queries adapted to the testdata star schema.

Each ``q*`` function is the Spark-first plan (declarative DataFrame ops
→ Catalyst chooses broadcast/SMJ/partial-agg); ``ORACLE`` carries the
DuckDB twin with identical arithmetic & aliases for the correctness
gate. Dimension tables are broadcast explicitly where TPC-H scaling
guarantees they stay small (region/nation/supplier/part); fact-fact
joins shuffle on their keys and rely on AQE for skew.

Date constants are adapted to the generated data's 1995–2001 range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from locopy_spark.functions.numeric import (
    SCALE,
    exact_sum,
    sql_exact_sum,
)
from locopy_spark.sources.tables import load_table

def _disc_price():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_DISC_PRICE = "l_extendedprice * (1 - l_discount)"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy groupBy with 8 aggregates.

    Plan notes: single parquet scan, filter pushed to the scan, partial
    (map-side) aggregation before one shuffle on the 6-value grouping
    key. No joins. Survives any scale — output is 6 rows.
    """
    l = load_table(spark, sf_dir, "lineitem")
    charge = _disc_price() * (1 + F.col("l_tax"))
    out = (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            exact_sum("l_extendedprice", "sum_base_price"),
            exact_sum(_disc_price(), "sum_disc_price"),
            exact_sum(charge, "sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: segment filter → 3-way join → top-10 revenue orders.

    customer is filtered before the join (predicate above the scan →
    pushdown); orders⨝lineitem shuffles on orderkey; the filtered
    customer side is small enough for AQE to broadcast at low SF and
    shuffle-hash at high SF — we do not force it.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-06-01").cast("timestamp_ntz")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(exact_sum(_disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join, revenue by nation within a region.

    region/nation/supplier are broadcast (constant-size dims at any
    SF); the o⨝l fact join shuffles on orderkey; the c_nationkey =
    s_nationkey constraint closes the snowflake.
    """
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(exact_sum(_disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: selective filter + single aggregate (scan-bound).

    All three predicates reach the parquet scan as pushed filters;
    only 3 columns are read (column pruning).
    """
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(exact_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: lost-revenue ranking of customers who returned items."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exact_sum(_disc_price(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — conditional aggregation over a
    part⨝lineitem join. part is broadcast (slow-growing dim)."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(F.lit(0.0))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            exact_sum(promo, "promo_sum"),
            exact_sum(_disc_price(), "total_sum"),
        )
        .select(
            (F.lit(100.0) * F.col("promo_sum") / F.col("total_sum")).alias(
                "promo_revenue_pct"
            )
        )
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold.

    The HAVING subquery is a semi-join against an aggregate of the same
    fact table — Spark computes the aggregate once and semi-joins on
    orderkey (one shuffle each side, co-partitioned)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by retail price per brand — window row_number.

    Partial top-k per partition happens via the window's rank filter;
    with one task per brand (25 keys) this is the canonical
    one-shuffle top-k-per-group plan and parallelism scales with key
    cardinality. When the group count is small relative to the
    cluster (a handful of priorities/languages), use the bounded
    two-level salted top-K instead (``operators/sampling.py``, used by
    ``d_balanced_sample``) or the range-partitioned rank
    (``operators/ranking.grouped_global_row_number``, used by
    ``q_window_funcs``).
    """
    p = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rk")
        .orderBy("p_brand", "rk")
    )


def q_mktseg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order totals by market segment × order status."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = o.join(c, o.o_custkey == c.c_custkey)
    return (
        joined.groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(exact_sum("o_totalprice", "t"))
        .withColumnRenamed("F", "total_f")
        .withColumnRenamed("O", "total_o")
        .withColumnRenamed("P", "total_p")
        .orderBy("c_mktsegment")
    )


def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(n_name, c_mktsegment): hierarchical totals + grouping ids."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        joined.rollup("n_name", "c_mktsegment")
        .agg(
            exact_sum("o_totalprice", "total_sales"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("c_mktsegment").cast("int").alias("g_seg"),
        )
        .orderBy(
            F.asc_nulls_first("n_name"), F.asc_nulls_first("c_mktsegment")
        )
    )


def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct cardinalities per market segment (expand-based
    multi-distinct plan; at scale each COUNT DISTINCT re-shuffles on
    (group, value) — kept to two distincts deliberately)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("c_mktsegment")
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distincts, oracle-hardened: the sketch
    value itself is engine-specific, so the output carries the EXACT
    distinct counts (DuckDB-checkable) plus booleans asserting the HLL
    estimate (rsd=0.01) landed within 5% of exact.  A drifting sketch
    flips a boolean and fails the hash gate — far stronger than the
    rows-only check this query had in round 1.  The exact side-channel
    is the verification harness; the production path at scale is the
    sketch alone (mergeable, constant memory)."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("__ao"),
        F.approx_count_distinct("l_partkey", 0.01).alias("__ap"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) * F.lit(100) <= F.lit(5) * F.col(e)
    )
    return (
        agg.select(
            "l_returnflag",
            "exact_orders",
            "exact_parts",
            within("__ao", "exact_orders").alias("orders_ok"),
            within("__ap", "exact_parts").alias("parts_ok"),
        )
        .orderBy("l_returnflag")
    )


ORACLE: dict[str, str] = {
    "q1_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_exact_sum("l_quantity", "sum_qty")},
               {sql_exact_sum("l_extendedprice", "sum_base_price")},
               {sql_exact_sum(_SQL_DISC_PRICE, "sum_disc_price")},
               {sql_exact_sum(_SQL_DISC_PRICE + " * (1 + l_tax)", "sum_charge")},
               COUNT(*) AS count_order,
               {sql_exact_sum("l_quantity")} / COUNT(*) AS avg_qty,
               {sql_exact_sum("l_extendedprice")} / COUNT(*) AS avg_price
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q3_top_unshipped": f"""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
               {sql_exact_sum(_SQL_DISC_PRICE, "revenue")}
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_region_volume": f"""
        SELECT n_name, {sql_exact_sum(_SQL_DISC_PRICE, "revenue")}
        FROM region
        JOIN nation ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
    "q6_forecast_revenue": f"""
        SELECT {sql_exact_sum("l_extendedprice * l_discount", "revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "q10_returned_items": f"""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               {sql_exact_sum(_SQL_DISC_PRICE, "revenue")}
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q14_promo_revenue": f"""
        SELECT 100.0 * promo_sum / total_sum AS promo_revenue_pct
        FROM (
          SELECT
            {sql_exact_sum(
                "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount)"
                " ELSE 0.0 END",
                "promo_sum",
            )},
            {sql_exact_sum(_SQL_DISC_PRICE, "total_sum")}
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
        )
    """,
    "q18_large_orders": f"""
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, total_qty
        FROM orders
        JOIN (
          SELECT l_orderkey,
                 {sql_exact_sum("l_quantity", "total_qty")}
          FROM lineitem GROUP BY l_orderkey
          HAVING {sql_exact_sum("l_quantity")} > 150
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
    "q_topk_per_group": """
        SELECT p_brand, p_partkey, p_name, p_retailprice, rk
        FROM (
          SELECT p_brand, p_partkey, p_name, p_retailprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY p_brand
                   ORDER BY p_retailprice DESC, p_partkey ASC
                 ) AS rk
          FROM part
        )
        WHERE rk <= 3
        ORDER BY p_brand, rk
    """,
    "q_mktseg_pivot": f"""
        SELECT c_mktsegment,
               {sql_exact_sum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", "total_f")},
               {sql_exact_sum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", "total_o")},
               {sql_exact_sum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", "total_p")}
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    "q_rollup_sales": f"""
        SELECT n_name, c_mktsegment,
               {sql_exact_sum("o_totalprice", "total_sales")},
               COUNT(*) AS n_orders,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP(n_name, c_mktsegment)
        ORDER BY n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST
    """,
    "q_distinct_counts": """
        SELECT c_mktsegment,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(DISTINCT o_orderkey) AS n_orders,
               COUNT(*) AS n_rows
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    # Sketch query: exact counts are cross-engine; the *_ok booleans are
    # TRUE iff Spark's HLL estimate is within 5% of exact, which the
    # oracle asserts by construction (a drifting sketch hash-mismatches).
    "q_approx_distinct": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS orders_ok,
               TRUE AS parts_ok
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
}


# -- basket size distribution ---------------------------------------------------


def q_basket_size_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Units-per-transaction distribution: how many line items do
    orders carry, with exact ppm shares and the average order value
    per basket size — the assortment/bundling read next to
    q_market_basket's pair affinities (sizes say WHETHER baskets are
    multi-item; pairs say WHAT co-occurs).

    ONE co-partitioned equi-join of the per-order line count (a
    partial-aggregated |orders|-sized state) with orders on the order
    key, then the ≤\|max size\|-bounded rollup; value sums are exact
    scaled bigints, shares one ppm floor division, the average the
    exact-sum/count double.

    Split as state + finisher since r8: ``streaming.stateful.
    stream_basket_size`` maintains the per-order line-count state
    continuously; the histogram closes on demand against the static
    orders dim."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return basket_report(basket_state(l), o)


def basket_state(lineitem: DataFrame) -> DataFrame:
    """The per-order line-count state ``(l_orderkey, n_items)`` — a
    plain-sum monoid per key (late lines simply add), |orders| rows."""
    return lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items")
    )


def basket_report(sizes: DataFrame, orders: DataFrame) -> DataFrame:
    """Close the basket-size histogram over the line-count state,
    joining the orders dim for values (an order's SIZE keeps moving as
    lines arrive, so the bucket assignment happens only here)."""
    cells = (
        orders.join(sizes, orders.o_orderkey == sizes.l_orderkey)
        .groupBy("n_items")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
            ).alias("val_c"),
        )
    )
    tot = cells.agg(F.sum("n_orders").alias("n_total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .selectExpr(
            "n_items",
            "n_orders",
            "n_orders * 1000000 div n_total as share_ppm",
            f"CAST(val_c AS DOUBLE) / {SCALE}.0 / n_orders AS avg_value",
        )
        .orderBy("n_items")
    )


ORACLE["q_basket_size_dist"] = f"""
  WITH sizes AS (
    SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY 1
  ),
  cells AS (
    SELECT n_items, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS val_c
    FROM orders JOIN sizes ON o_orderkey = l_orderkey
    GROUP BY 1
  )
  SELECT CAST(n_items AS BIGINT) AS n_items, n_orders,
         CAST(n_orders * 1000000 //
              (SELECT SUM(n_orders) FROM cells) AS BIGINT) AS share_ppm,
         CAST(val_c AS DOUBLE) / {SCALE}.0 / n_orders AS avg_value
  FROM cells ORDER BY n_items
"""
