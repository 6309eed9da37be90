"""Extended TPC-H-style coverage: semi/anti joins, correlated
subqueries, interval arithmetic, running/moving windows, cube, set ops.

Same determinism rules as ``tpch``: exact scaled-bigint sums, NTZ
timestamp literals, explicit double casts, total orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from locopy_spark.functions.numeric import (
    SCALE,
    exact_avg,
    exact_sum,
    sql_exact_avg,
    sql_exact_sum,
)
from locopy_spark.functions.cache import managed_persist
from locopy_spark.sources.tables import load_table

_DISC = "l_extendedprice * (1 - l_discount)"


def _t(name: str):
    return F.lit(name).cast("timestamp_ntz")


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted: orders with at least one line shipped after
    the order date — EXISTS as a left-semi join (no row duplication,
    early-out per key)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _t("1996-07-01"))
        & (F.col("o_orderdate") < _t("1996-10-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year."""
    n1, n2 = "NATION_3", "NATION_7"
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _t("1996-01-01"))
        & (F.col("l_shipdate") < _t("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(nc), c.c_nationkey == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == n1) & (F.col("cust_nation") == n2))
            | ((F.col("supp_nation") == n2) & (F.col("cust_nation") == n1))
        )
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(exact_sum(F.expr(_DISC), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional order volume by year
    (conditional aggregation over a 7-table star)."""
    target = "NATION_5"
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _t("1996-01-01"))
        & (F.col("o_orderdate") < _t("1998-01-01"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    ns = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    joined = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nk"))
    )
    target_vol = F.when(F.col("supp_nation") == target, F.expr(_DISC)).otherwise(
        F.lit(0.0)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            exact_sum(target_vol, "nation_volume"),
            exact_sum(F.expr(_DISC), "total_volume"),
        )
        .withColumn(
            "mkt_share", F.expr("nation_volume / total_volume")
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp): profit by supplier nation and
    year for widget parts."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(exact_sum(F.expr(_DISC), "profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode): late-shipment ratio per order
    priority; interval arithmetic on NTZ timestamps."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    late = F.expr("l_shipdate > o_orderdate + INTERVAL '90' DAY")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(late.cast("int")).alias("n_late"),
        )
        .withColumn("late_ratio", F.expr("CAST(n_late AS DOUBLE) / n_lines"))
        .orderBy("o_orderpriority")
    )


def q13_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders per customer (left outer join
    keeps zero-order customers)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue —
    scalar-subquery-on-aggregate via a max join (deterministic: exact
    sums make the max unambiguous)."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _t("1996-01-01"))
        & (F.col("l_shipdate") < _t("1996-04-01"))
    )
    rev = l.groupBy("l_suppkey").agg(exact_sum(F.expr(_DISC), "total_rev"))
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_rev == mx.mx)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct suppliers per (brand, size),
    excluding a supplier set — NOT IN as a left-anti join."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & (F.col("p_size").isin(1, 5, 9, 13, 17))
    )
    l = load_table(spark, sf_dir, "lineitem")
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").contains("3"))
        .select(F.col("s_suppkey").alias("x_suppkey"))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(excl), l.l_suppkey == F.col("x_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders below 20% of the part's average
    quantity. The correlated scalar subquery becomes a window average
    per part (quantities are integer-valued doubles → exact sums →
    order-independent average)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    l = load_table(spark, sf_dir, "lineitem")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    w = W.partitionBy("p_partkey")
    qualified = joined.withColumn("avg_qty", F.avg("l_quantity").over(w)).filter(
        F.col("l_quantity") < 0.2 * F.col("avg_qty")
    )
    return qualified.agg(
        (exact_sum("l_extendedprice", "s")).alias("s")
    ).select((F.col("s") / F.lit(7.0)).alias("avg_yearly"))


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: OR-of-ANDs predicate across the part join — tests
    that disjunctive pushdown doesn't break the join."""
    p = load_table(spark, sf_dir, "part")
    l = load_table(spark, sf_dir, "lineitem")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(exact_sum(F.expr(_DISC), "revenue"))
    )


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted: suppliers involved in multi-supplier 'F'
    orders — EXISTS-with-inequality as a semi join."""
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = load_table(spark, sf_dir, "lineitem")
    l2 = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    base = l1.join(o, l1.l_orderkey == o.o_orderkey)
    multi = base.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    )
    return (
        multi.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted: above-average-balance customers with no
    recent orders — scalar aggregate threshold + NOT EXISTS anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _t("2001-01-01")
    )
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        exact_sum("c_acctbal", "s"), F.count(F.lit(1)).alias("n")
    ).select((F.col("s") / F.col("n")).alias("thr"))
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact_sum("c_acctbal", "totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running order total per customer — exact scaled-bigint window
    sum (order-deterministic at any parallelism)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    scaled = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    return (
        o.withColumn(
            "running_total",
            (F.sum(scaled).over(w).cast("double") / F.lit(float(SCALE))),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_totalprice",
            "running_total",
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving average of daily revenue — windows over exact
    scaled sums so every engine agrees bit-for-bit.

    The frame window is deliberately unpartitioned (it emits Spark's
    single-partition warning): it runs over the DAILY aggregate — one
    row per calendar day, a few thousand rows even for decades of 100
    TB data — never over raw lineitem. The heavy lifting is the
    partial-aggregated daily groupBy; a keyed series would use the
    per-key window of ``q_trailing_window`` instead."""
    l = load_table(spark, sf_dir, "lineitem")
    daily = (
        l.groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(
            F.sum(
                F.expr(f"cast(floor(({_DISC}) * {SCALE} + 0.5) as bigint)")
            ).alias("rev_fix")
        )
    )
    w = W.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.withColumn(
            "mov_avg_7d",
            (
                F.sum("rev_fix").over(w).cast("double")
                / F.lit(float(SCALE))
                / F.count("rev_fix").over(w)
            ),
        )
        .withColumn(
            "revenue", F.expr(f"CAST(rev_fix AS DOUBLE) / {SCALE}.0")
        )
        .select("day", "revenue", "mov_avg_7d")
        .orderBy("day")
    )


def q_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus) with grouping ids."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.cube("l_returnflag", "l_linestatus")
        .agg(
            exact_sum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
        )
        .orderBy(
            F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus")
        )
    )


def q_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference: customers active in 1996 but not in 1997."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= _t("1996-01-01"))
        & (F.col("o_orderdate") < _t("1997-01-01"))
    ).select("o_custkey")
    y97 = o.filter(
        (F.col("o_orderdate") >= _t("1997-01-01"))
        & (F.col("o_orderdate") < _t("1998-01-01"))
    ).select("o_custkey")
    # subtract = EXCEPT DISTINCT (set semantics; exceptAll would keep
    # multiplicity and leak customers with more '96 than '97 orders)
    return y96.subtract(y97).orderBy("o_custkey")


ORACLE: dict[str, str] = {
    "q4_order_priority": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q7_nation_volume": f"""
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               {sql_exact_sum(_DISC, "revenue")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
          AND ((ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
            OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3
        ORDER BY 1, 2, 3
    """,
    "q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               {sql_exact_sum(
                   "CASE WHEN ns.n_name = 'NATION_5' THEN " + _DISC + " ELSE 0.0 END",
                   "nation_volume",
               )},
               {sql_exact_sum(_DISC, "total_volume")},
               ({sql_exact_sum(
                   "CASE WHEN ns.n_name = 'NATION_5' THEN " + _DISC + " ELSE 0.0 END"
               )}) / ({sql_exact_sum(_DISC)}) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region ON nc.n_regionkey = r_regionkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1 ORDER BY 1
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               {sql_exact_sum(_DISC, "profit")}
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%widget%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC
    """,
    "q12_late_lines": """
        SELECT o_orderpriority,
               COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
               CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS late_ratio
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    "q13_customer_orders": """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
          SELECT l_suppkey, {sql_exact_sum(_DISC, "total_rev")}
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_rev
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        ORDER BY s_suppkey
    """,
    "q16_supplier_cnt": """
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type != 'PROMO' AND p_size IN (1, 5, 9, 13, 17)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3%'
          )
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    "q17_small_quantity": f"""
        WITH j AS (
          SELECT l_extendedprice, l_quantity,
                 AVG(l_quantity) OVER (PARTITION BY p_partkey) AS avg_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#1'
        )
        SELECT ({sql_exact_sum("l_extendedprice")}) / 7.0 AS avg_yearly
        FROM j WHERE l_quantity < 0.2 * avg_qty
    """,
    "q19_disjunctive": f"""
        SELECT {sql_exact_sum(_DISC, "revenue")}
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 30)
    """,
    "q21_waiting_supplier": """
        SELECT s_name, COUNT(*) AS numwait
        FROM lineitem l1
        JOIN orders ON l1.l_orderkey = o_orderkey
        JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE o_orderstatus = 'F'
          AND EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey != l1.l_suppkey
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
    "q22_dormant_customers": f"""
        WITH thr AS (
          SELECT ({sql_exact_sum("c_acctbal")}) / COUNT(*) AS thr
          FROM customer WHERE c_acctbal > 0
        )
        SELECT c_nationkey, COUNT(*) AS numcust,
               {sql_exact_sum("c_acctbal", "totacctbal")}
        FROM customer, thr
        WHERE c_acctbal > thr
          AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
          )
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
    "q_running_total": f"""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
               o_totalprice,
               CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) / {SCALE}.0 AS running_total
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
    "q_moving_avg": f"""
        WITH daily AS (
          SELECT CAST(l_shipdate AS DATE) AS day,
                 SUM(CAST(FLOOR(({_DISC}) * {SCALE} + 0.5) AS BIGINT)) AS rev_fix
          FROM lineitem GROUP BY 1
        )
        SELECT day,
               CAST(rev_fix AS DOUBLE) / {SCALE}.0 AS revenue,
               CAST(SUM(rev_fix) OVER w AS DOUBLE) / {SCALE}.0
                 / COUNT(rev_fix) OVER w AS mov_avg_7d
        FROM daily
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day
    """,
    "q_cube_returns": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_exact_sum("l_quantity", "sum_qty")},
               COUNT(*) AS n_rows,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
    "q_except_customers": """
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        EXCEPT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ORDER BY o_custkey
    """,
}


def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample stddev of order value per priority from exact
    integer power sums (DECIMAL(38) accumulators — overflow-safe at any
    SF; the variance formula runs in double with the identical
    expression text on both engines, so results are bit-stable)."""
    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        "o_orderpriority",
        F.expr("cast(floor(o_totalprice + 0.5) as bigint)").alias("v"),
    )
    return (
        v.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("cast(v as decimal(38,0))")).alias("s"),
            F.sum(F.expr("cast(v * v as decimal(38,0))")).alias("s2"),
        )
        .select(
            "o_orderpriority",
            "n",
            F.expr("CAST(s AS DOUBLE) / n").alias("mean_val"),
            F.expr(
                "sqrt((CAST(s2 AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) * n / (n - 1))"
            ).alias("stddev_val"),
        )
        .orderBy("o_orderpriority")
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — (priority), (status), and grand total
    in one pass (Catalyst expands to a single shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        f"""
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               {''}CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)) AS DOUBLE) / {SCALE}.0 AS sum_price,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_st
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus
        """
    )


def q_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection: customers active in both 1996 and 1997."""
    o = load_table(spark, sf_dir, "orders")

    def _yr(y: int):
        return o.filter(
            (F.col("o_orderdate") >= _t(f"{y}-01-01"))
            & (F.col("o_orderdate") < _t(f"{y + 1}-01-01"))
        ).select("o_custkey")

    return _yr(1996).intersect(_yr(1997)).orderBy("o_custkey")


def q_dow_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by day-of-week, computed as (epoch_day + 4) % 7
    (0=Sunday) — pure integer math, identical in every engine and
    session time zone (engine-native dayofweek() functions disagree on
    numbering)."""
    l = load_table(spark, sf_dir, "lineitem")
    dow = F.expr(
        "(datediff(cast(l_shipdate as date), date'1970-01-01') + 4) % 7"
    )
    return (
        l.groupBy(dow.alias("dow"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            exact_sum(F.expr(_DISC), "revenue"),
        )
        .orderBy("dow")
    )


ORACLE.update(
    {
        "q_stats_moments": """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_val,
               sqrt((CAST(SUM(v * v) AS DOUBLE) / COUNT(*)
                     - (CAST(SUM(v) AS DOUBLE) / COUNT(*)) * (CAST(SUM(v) AS DOUBLE) / COUNT(*)))
                    * COUNT(*) / (COUNT(*) - 1)) AS stddev_val
        FROM (
          SELECT o_orderpriority,
                 CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS v
          FROM orders
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "q_grouping_sets": f"""
        SELECT o_orderpriority, o_orderstatus,
               COUNT(*) AS n_orders,
               {sql_exact_sum('o_totalprice', 'sum_price')},
               CAST(GROUPING(o_orderpriority) AS INT) AS g_pri,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_st
        FROM orders
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        ORDER BY g_pri, g_st, o_orderpriority, o_orderstatus
        """,
        "q_intersect_customers": """
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        INTERSECT
        SELECT DISTINCT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ORDER BY o_custkey
        """,
        "q_dow_revenue": f"""
        SELECT (datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) + 4) % 7 AS dow,
               COUNT(*) AS n_lines,
               {sql_exact_sum(_DISC, 'revenue')}
        FROM lineitem
        GROUP BY 1 ORDER BY 1
        """,
    }
)


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp): suppliers whose shipped
    quantity of widget parts in 1996 exceeds a threshold — semi join
    against an aggregate-derived key set."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _t("1996-01-01"))
        & (F.col("l_shipdate") < _t("1997-01-01"))
    )
    s = load_table(spark, sf_dir, "supplier")
    qual = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(exact_sum("l_quantity", "qty"))
        .filter(F.col("qty") > 100.0)
        .select("l_suppkey")
    )
    return (
        s.join(qual, s.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value deciles (ntile over an exact total order) with
    per-decile stats — the LTV-binning shape."""
    from locopy_spark.operators.ranking import global_ntile

    o = load_table(spark, sf_dir, "orders")
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    deciled = global_ntile(
        o.select("o_orderkey", v.alias("v")),
        order_cols=["v", "o_orderkey"],
        n=10,
        out_col="decile",
    )
    return (
        deciled
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(f"CAST(SUM(v) AS DOUBLE) / {SCALE}.0").alias("sum_price"),
            F.expr(f"CAST(MIN(v) AS DOUBLE) / {SCALE}.0").alias("min_price"),
            F.expr(f"CAST(MAX(v) AS DOUBLE) / {SCALE}.0").alias("max_price"),
        )
        .orderBy("decile")
    )


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 adapted (no partsupp): for STANDARD size-5 parts, the
    ASIA supplier(s) offering the minimum observed unit price. The
    correlated MIN subquery becomes a per-part window min; MIN over
    doubles (no summation) is order-independent, so the double compare
    is engine-stable. Dims broadcast; the only shuffle is the
    (part, supplier) aggregation."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    l = load_table(spark, sf_dir, "lineitem")
    per_ps = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "n_name")
        .agg(F.min(F.expr("l_extendedprice / l_quantity")).alias("unit_cost"))
    )
    w = W.partitionBy("p_partkey")
    return (
        per_ps.withColumn("mc", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("mc"))
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    )


Q11_FRACTION = 0.002


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp): parts whose shipped value from
    NATION_2 suppliers exceeds a fraction of that nation's total. The
    group-vs-global HAVING threshold is a broadcast scalar join; both
    the per-part and total values come from the SAME scaled-bigint
    partial sums, so the strict > compare is exact."""
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_2"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    l = load_table(spark, sf_dir, "lineitem")
    scaled = F.expr(f"cast(floor(({_DISC}) * {SCALE} + 0.5) as bigint)")
    per_part = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(scaled).alias("vfix"))
    )
    total = per_part.agg(F.sum("vfix").alias("tfix"))
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("vfix").cast("double")
            > F.lit(Q11_FRACTION) * F.col("tfix").cast("double")
        )
        .select(
            "l_partkey",
            F.expr(f"CAST(vfix AS DOUBLE) / {SCALE}.0").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 Bernoulli sample of orders via an md5-prefix
    gate (same row set on any engine, any partitioning, any re-run —
    unlike rand()-based sampling), with per-priority sample stats and
    the scaled-up population estimate. The filter is a pure row-local
    predicate: no shuffle added, pushes through to the scan stage."""
    o = load_table(spark, sf_dir, "orders")
    sampled = o.filter(
        F.expr("substring(md5(cast(o_orderkey as string)), 1, 1)") == "0"
    )
    return (
        sampled.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            exact_sum("o_totalprice", "sum_price"),
        )
        .withColumn("est_total_orders", F.col("n_sample") * F.lit(16))
        .orderBy("o_orderpriority")
    )


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long reshape: per-status aggregates unpivoted to
    (status, metric, value) rows with stack() — the inverse of
    q_mktseg_pivot. stack is a row-local generator: one shuffle for
    the aggregation, none for the reshape."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        exact_sum("o_totalprice", "sum_price"),
        exact_avg("o_totalprice", "avg_price"),
    )
    return (
        wide.selectExpr(
            "o_orderstatus",
            "stack(3, 'avg_price', avg_price, 'n_orders', n_orders, "
            "'sum_price', sum_price) AS (metric, value)",
        )
        .orderBy("o_orderstatus", "metric")
    )


ORACLE.update(
    {
        "q2_min_cost_supplier": """
        WITH per_ps AS (
          SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
                 MIN(l_extendedprice / l_quantity) AS unit_cost
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE p_size = 5 AND p_type = 'STANDARD' AND r_name = 'ASIA'
          GROUP BY 1, 2, 3, 4, 5
        )
        SELECT p_partkey, p_name, s_name, n_name, unit_cost
        FROM (
          SELECT *, MIN(unit_cost) OVER (PARTITION BY p_partkey) AS mc
          FROM per_ps
        )
        WHERE unit_cost = mc
        ORDER BY p_partkey, s_name
        """,
        "q11_important_parts": f"""
        WITH per_part AS (
          SELECT l_partkey,
                 SUM(CAST(FLOOR(({_DISC}) * {SCALE} + 0.5) AS BIGINT)) AS vfix
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_2'
          GROUP BY 1
        )
        SELECT l_partkey, CAST(vfix AS DOUBLE) / {SCALE}.0 AS part_value
        FROM per_part
        WHERE CAST(vfix AS DOUBLE)
              > {Q11_FRACTION} * (SELECT CAST(SUM(vfix) AS DOUBLE) FROM per_part)
        ORDER BY part_value DESC, l_partkey
        """,
        "q_hash_sample": f"""
        SELECT o_orderpriority, COUNT(*) AS n_sample,
               {sql_exact_sum('o_totalprice', 'sum_price')},
               COUNT(*) * 16 AS est_total_orders
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        "q_unpivot_metrics": f"""
        WITH wide AS (
          SELECT o_orderstatus,
                 CAST(COUNT(*) AS DOUBLE) AS n_orders,
                 {sql_exact_sum('o_totalprice', 'sum_price')},
                 {sql_exact_avg('o_totalprice', 'avg_price')}
          FROM orders GROUP BY 1
        )
        SELECT o_orderstatus, metric, value FROM (
          SELECT o_orderstatus, 'avg_price' AS metric, avg_price AS value FROM wide
          UNION ALL
          SELECT o_orderstatus, 'n_orders', n_orders FROM wide
          UNION ALL
          SELECT o_orderstatus, 'sum_price', sum_price FROM wide
        )
        ORDER BY o_orderstatus, metric
        """,
    }
)


ORACLE.update(
    {
        "q20_excess_suppliers": f"""
        SELECT s_suppkey, s_name FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE '%widget%'
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          GROUP BY l_suppkey
          HAVING {sql_exact_sum('l_quantity')} > 100.0
        )
        ORDER BY s_suppkey
        """,
        "q_value_deciles": f"""
        WITH r AS (
          SELECT o_orderkey,
                 CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v,
                 NTILE(10) OVER (ORDER BY CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT), o_orderkey) AS decile
          FROM orders
        )
        SELECT decile, COUNT(*) AS n_orders,
               CAST(SUM(v) AS DOUBLE) / {SCALE}.0 AS sum_price,
               CAST(MIN(v) AS DOUBLE) / {SCALE}.0 AS min_price,
               CAST(MAX(v) AS DOUBLE) / {SCALE}.0 AS max_price
        FROM r GROUP BY decile ORDER BY decile
        """,
    }
)


def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window showcase: percent_rank / cume_dist plus
    first/last/nth over an explicit full-partition frame.

    Scale shape: ``o_orderpriority`` has 5 distinct values, so a plain
    ``Window.partitionBy`` would sort 20% of the table per task. Instead
    the per-group rank comes from the range-partitioned
    ``grouped_global_row_number`` (full parallelism); with the unique
    ordering key (scaled price, orderkey), percent_rank = (rn-1)/(n-1)
    and cume_dist = rn/n, and the full-frame first/last/nth collapse to
    the rows at rn ∈ {1, 2, n} — a 15-row broadcast join."""
    o = load_table(spark, sf_dir, "orders")
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    base = o.select("o_orderkey", "o_orderpriority", v.alias("v"))
    from locopy_spark.operators.ranking import grouped_global_row_number

    from locopy_spark.functions.cache import managed_persist

    # persist the ranked table (r11): the extremes aggregate and the
    # final projection both consume it, and un-persisted each replays
    # the rank window over the checkpointed ranges (interleaved A/B at
    # sf0.1: 1.46 -> 1.20 s best-of-4)
    ranked = managed_persist(
        grouped_global_row_number(
            base, ["o_orderpriority"], ["v", "o_orderkey"],
            out_col="__rn", size_col="__n",
        ),
        "window_funcs",
    )
    extremes = (
        ranked.filter(
            (F.col("__rn") == 1)
            | (F.col("__rn") == 2)
            | (F.col("__rn") == F.col("__n"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.max(F.when(F.col("__rn") == 1, F.col("o_orderkey"))).alias(
                "cheapest_key"
            ),
            F.max(F.when(F.col("__rn") == F.col("__n"), F.col("o_orderkey"))).alias(
                "priciest_key"
            ),
            F.max(
                F.when(
                    (F.col("__rn") == 2) & (F.col("__n") >= 2), F.col("o_orderkey")
                )
            ).alias("second_key"),
        )
    )
    return (
        ranked.join(F.broadcast(extremes), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.expr(f"CAST(v AS DOUBLE) / {SCALE}.0").alias("price"),
            F.when(
                F.col("__n") > 1,
                (F.col("__rn") - 1).cast("double") / (F.col("__n") - 1),
            )
            .otherwise(F.lit(0.0))
            .alias("pct_rank"),
            (F.col("__rn").cast("double") / F.col("__n")).alias("cume"),
            "cheapest_key",
            "priciest_key",
            "second_key",
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


HIST_BUCKET = 20000


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order values — integer bucketing is a
    row-local expression, so the whole query is one partial-aggregated
    shuffle on a few dozen bucket keys."""
    o = load_table(spark, sf_dir, "orders")
    b = F.expr(f"cast(floor(o_totalprice / {HIST_BUCKET}) as int)")
    return (
        o.groupBy(b.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            exact_sum("o_totalprice", "sum_price"),
        )
        .withColumn("bucket_lo", F.col("bucket") * F.lit(HIST_BUCKET))
        .orderBy("bucket")
    )


ORACLE.update(
    {
        "q_window_funcs": f"""
        SELECT o_orderkey, o_orderpriority,
               CAST(v AS DOUBLE) / {SCALE}.0 AS price,
               percent_rank() OVER wo AS pct_rank,
               cume_dist() OVER wo AS cume,
               first_value(o_orderkey) OVER wf AS cheapest_key,
               last_value(o_orderkey) OVER wf AS priciest_key,
               nth_value(o_orderkey, 2) OVER wf AS second_key
        FROM (
          SELECT o_orderkey, o_orderpriority,
                 CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v
          FROM orders
        )
        WINDOW
          wo AS (PARTITION BY o_orderpriority ORDER BY v, o_orderkey),
          wf AS (PARTITION BY o_orderpriority ORDER BY v, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_orderpriority, o_orderkey
        """,
        "q_histogram": f"""
        SELECT CAST(FLOOR(o_totalprice / {HIST_BUCKET}) AS INT) AS bucket,
               COUNT(*) AS n_orders,
               {sql_exact_sum('o_totalprice', 'sum_price')},
               CAST(FLOOR(o_totalprice / {HIST_BUCKET}) AS INT) * {HIST_BUCKET} AS bucket_lo
        FROM orders
        GROUP BY 1
        ORDER BY bucket
        """,
    }
)


def q_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 20 heaviest lineitem order keys
    with their share of total rows — the report that decides whether a
    downstream join needs salting or AQE skew handling. One partial
    aggregation + a top-k; the total arrives via a 1-row broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    per_key = l.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    total = per_key.agg(F.sum("n").alias("tot"))
    return (
        per_key.join(F.broadcast(total))
        .withColumn("share", F.expr("CAST(n AS DOUBLE) / tot"))
        .select("l_orderkey", "n", "share")
        .orderBy(F.desc("n"), "l_orderkey")
        .limit(20)
    )


ORACLE.update(
    {
        "q_key_skew": """
        WITH k AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
             t AS (SELECT SUM(n) AS tot FROM k)
        SELECT l_orderkey, n, CAST(n AS DOUBLE) / tot AS share
        FROM k, t
        ORDER BY n DESC, l_orderkey
        LIMIT 20
        """,
    }
)


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto frontier) of orders per priority: orders not
    dominated on (totalprice, orderdate) — no other order of the same
    priority has BOTH a >= price and a >= date with one strict. The
    classic multi-criteria shortlist (research literature: Borzsony
    et al., ICDE'01), expressed without a quadratic self-join.

    Sort-scan formulation: reduce to per-(priority, price) max date
    (dominated-within-price rows fall out), then one cummax window
    over the per-price rows in descending price order — a row
    survives iff its date strictly exceeds every higher-price date.
    Work: one partial-aggregated groupBy + a window over DISTINCT
    prices per priority (bounded far below row count), then a
    semi-join back to emit the surviving rows.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    d = F.expr(
        "datediff(cast(o_orderdate as date), date'1970-01-01')"
    )
    base = o.select(
        "o_orderkey",
        "o_orderpriority",
        v.alias("price_fix"),
        d.alias("day"),
    )
    pp = base.groupBy("o_orderpriority", "price_fix").agg(
        F.max("day").alias("max_day")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.desc("price_fix"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        pp.withColumn("hi_day", F.max("max_day").over(w))
        .filter(F.col("hi_day").isNull() | (F.col("max_day") > F.col("hi_day")))
        .select("o_orderpriority", "price_fix", F.col("max_day").alias("day"))
    )
    return (
        base.join(frontier, ["o_orderpriority", "price_fix", "day"])
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.expr(f"CAST(price_fix AS DOUBLE) / {SCALE}.0").alias("price"),
            "day",
        )
        .orderBy("o_orderpriority", "o_orderkey")
    )


ORACLE["q_skyline"] = f"""
  WITH b AS (
    SELECT o_orderkey, o_orderpriority,
           CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS price_fix,
           CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
    FROM orders
  ),
  pp AS (
    SELECT o_orderpriority, price_fix, MAX(day) AS max_day
    FROM b GROUP BY 1, 2
  ),
  f AS (
    SELECT o_orderpriority, price_fix, max_day AS day,
           MAX(max_day) OVER (
             PARTITION BY o_orderpriority ORDER BY price_fix DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS hi_day
    FROM pp
  )
  SELECT b.o_orderpriority, b.o_orderkey,
         CAST(b.price_fix AS DOUBLE) / {SCALE}.0 AS price, b.day
  FROM b JOIN f
    ON b.o_orderpriority = f.o_orderpriority
   AND b.price_fix = f.price_fix AND b.day = f.day
  WHERE f.hi_day IS NULL OR f.day > f.hi_day
  ORDER BY b.o_orderpriority, b.o_orderkey
"""


# -- entity resolution ------------------------------------------------------

FUZZY_MAX_DIST = 3


def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution over the part catalog: candidate merge
    pairs of DISTINCT product names within Levenshtein distance
    {FUZZY_MAX_DIST}, with the row mass each name covers — the
    block → verify pattern every dedup/ER pipeline uses (catalog
    normalization, "red rod" vs "red ring").

    Scale shape: names collapse to a VOCABULARY-sized distinct table
    before any pairing (the fact table contributes only a count per
    name), blocking on the first token bounds each join bucket to one
    block's names, and the O(|a|·|b|) edit-distance verify runs
    row-local on candidates only. The full-catalog cross join never
    exists; at 100 TB the shuffle carries the name vocabulary, not
    the rows. Both engines implement standard DP levenshtein, so
    distances (and the output set) are exact cross-engine.
    """
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_rows"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_rows").alias("rows_a"),
        F.expr("split_part(p_name, ' ', 1)").alias("blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_rows").alias("rows_b"),
        F.expr("split_part(p_name, ' ', 1)").alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("name_a", "name_b", "dist", "rows_a", "rows_b")
        .orderBy("name_a", "name_b")
    )


ORACLE["q_fuzzy_match"] = f"""
  WITH n AS (
    SELECT p_name, COUNT(*) AS n_rows FROM part GROUP BY 1
  )
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
         a.n_rows AS rows_a, b.n_rows AS rows_b
  FROM n a JOIN n b
    ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
   AND a.p_name < b.p_name
   AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
  ORDER BY name_a, name_b
"""


# -- bloom-filter semi-join -------------------------------------------------

BLOOM_M = 65536  # bits
BLOOM_K = 4      # hash functions


def _bloom_pos_spark(keycol: str) -> str:
    return (
        f"transform(sequence(1, {BLOOM_K}), h -> "
        f"cast(conv(substring(md5(concat(cast(h as string), ':', "
        f"cast({keycol} as string))), 1, 8), 16, 10) as bigint)"
        f" % {BLOOM_M})"
    )


def _bloom_pos_duck(keycol: str) -> str:
    return (
        f"list_transform(generate_series(1, {BLOOM_K}), h -> "
        f"CAST(('0x' || substr(md5(CAST(h AS VARCHAR) || ':' || "
        f"CAST({keycol} AS VARCHAR)), 1, 8)) AS BIGINT) % {BLOOM_M})"
    )


BLOOM_N_PROBES = 5000  # provably-absent probe keys (negative namespace)


def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, measured: build a {BLOOM_K}-hash
    /{BLOOM_M}-bit filter over the DISTINCT ordering customers, probe
    it with {BLOOM_N_PROBES} PROVABLY-absent keys (the negative key
    namespace — custkeys are non-negative, so every probe is a true
    negative), and report the exact false-positive count — the number
    the filter's pruning power at 100 TB actually depends on.

    Scale shape: the set-bit table is bounded by {BLOOM_M} rows
    regardless of build-side size (distinct positions), so it
    BROADCASTS and probing is map-side — exactly how a runtime filter
    prunes a fact scan before the real join. Hash positions are
    md5-derived (identical hex cross-engine), so bit membership, FP
    count, and fp_ppm are all exact integers on both engines.
    """
    o = load_table(spark, sf_dir, "orders")
    build = o.select("o_custkey").distinct()
    bits = (
        build.select(
            F.explode(F.expr(_bloom_pos_spark("o_custkey"))).alias("pos")
        )
        .distinct()
    )
    probes = spark.range(1, BLOOM_N_PROBES + 1).select(
        (-F.col("id")).alias("probe_key")
    )
    probe_pos = probes.select(
        "probe_key",
        F.explode(F.expr(_bloom_pos_spark("probe_key"))).alias("pos"),
    )
    fp = (
        probe_pos.join(F.broadcast(bits), "pos")
        .groupBy("probe_key")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .filter(F.col("n_hit") == BLOOM_K)
        .agg(F.count(F.lit(1)).alias("n_false_pos"))
    )
    n_keys = build.agg(F.count(F.lit(1)).alias("n_keys"))
    n_bits = bits.agg(F.count(F.lit(1)).alias("n_set_bits"))
    return (
        n_keys.join(n_bits)
        .join(fp)
        .select(
            "n_keys",
            F.lit(BLOOM_N_PROBES).cast("long").alias("n_probes"),
            "n_set_bits",
            "n_false_pos",
            F.expr(
                f"n_false_pos * 1000000 div {BLOOM_N_PROBES}"
            ).alias("fp_ppm"),
        )
    )


ORACLE["q_bloom_semijoin"] = f"""
  WITH build AS (SELECT DISTINCT o_custkey FROM orders),
  bits AS (
    SELECT DISTINCT UNNEST({_bloom_pos_duck('o_custkey')}) AS pos
    FROM build
  ),
  probes AS (
    SELECT -CAST(UNNEST(generate_series(1, {BLOOM_N_PROBES})) AS BIGINT)
           AS probe_key
  ),
  probe AS (
    SELECT probe_key, UNNEST({_bloom_pos_duck('probe_key')}) AS pos
    FROM probes
  ),
  fp AS (
    SELECT COUNT(*) AS n_false_pos FROM (
      SELECT p.probe_key FROM probe p JOIN bits b ON p.pos = b.pos
      GROUP BY p.probe_key HAVING COUNT(*) = {BLOOM_K}
    )
  )
  SELECT (SELECT COUNT(*) FROM build) AS n_keys,
         CAST({BLOOM_N_PROBES} AS BIGINT) AS n_probes,
         (SELECT COUNT(*) FROM bits) AS n_set_bits,
         fp.n_false_pos,
         CAST(fp.n_false_pos * 1000000 // {BLOOM_N_PROBES} AS BIGINT)
           AS fp_ppm
  FROM fp
"""


# -- RFM segmentation -------------------------------------------------------

def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: exact quartile scores on Recency
    (latest order day), Frequency (order count) and Monetary (exact
    fixed-point spend), rolled up per (r, f, m) segment cell — the
    classic CRM deliverable (quartile 4 = best on every axis).

    All three quartile passes use ``operators.ranking.global_ntile``
    (range-partitioned rank + P-number driver offsets — no
    one-partition window over |customers|), with the customer key as
    the deterministic tiebreak, so every score matches DuckDB's
    NTILE(4) convention bit-for-bit (the tile arithmetic itself is
    property-tested against the SQL convention). Monetary sums are the
    repo's floor-scaled bigints; the per-cell rollup is bounded at 64
    rows.
    """
    from locopy_spark.operators.ranking import global_ntile

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.expr(
            "max(datediff(cast(o_orderdate as date), date'1970-01-01'))"
        ).alias("recency_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(
            F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
        ).alias("monetary_fix"),
    )
    # NO persist here (r12 session 2): the session-1 persist was
    # A/B'd against the plain form — persist min 2.52 s vs 2.23 s
    # without — the cheap per-customer aggregate is exactly the
    # "cheap inputs lose" case of the ranking._ranged adjudication
    # (the cache-materialization barrier costs more than the ntile
    # sampler's re-read saves).
    scored = global_ntile(
        per_cust, ["recency_day", "o_custkey"], 4, out_col="r_q"
    )
    scored = global_ntile(
        scored, ["frequency", "o_custkey"], 4, out_col="f_q"
    )
    scored = global_ntile(
        scored, ["monetary_fix", "o_custkey"], 4, out_col="m_q"
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr(
                f"cast(sum(monetary_fix) as double) / {SCALE}.0"
            ).alias("monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


ORACLE["q_rfm_segmentation"] = f"""
  WITH per_cust AS (
    SELECT o_custkey,
           MAX(datediff('day', DATE '1970-01-01',
                        CAST(o_orderdate AS DATE))) AS recency_day,
           COUNT(*) AS frequency,
           SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
             AS monetary_fix
    FROM orders GROUP BY 1
  ),
  scored AS (
    SELECT o_custkey, monetary_fix,
           NTILE(4) OVER (ORDER BY recency_day, o_custkey) AS r_q,
           NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_q,
           NTILE(4) OVER (ORDER BY monetary_fix, o_custkey) AS m_q
    FROM per_cust
  )
  SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
         CAST(m_q AS INT) AS m_q,
         COUNT(*) AS n_customers,
         CAST(CAST(SUM(monetary_fix) AS BIGINT) AS DOUBLE) / {SCALE}.0
           AS monetary
  FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# -- Pareto / ABC inventory classes -------------------------------------------

def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/20-style) inventory classification of parts by
    lifetime revenue: class A = the head of the revenue-descending
    order whose inclusive cumulative share stays ≤ 70 %, B ≤ 90 %,
    C the tail — the classic warehouse-stratification report.

    Exact construction: per-part WHOLE-currency-unit bigint revenue
    (cent precision adds nothing to a stratification and whole units
    keep the global cumulative sum inside bigint past 10^17 currency
    units — planet scale) (one partial-
    aggregated groupBy), ONE range-partitioned exclusive prefix sum
    over the revenue-descending total order (negated revenue +
    partkey tiebreak — operators.ranking.global_running_sum, no
    one-partition window), then the class boundaries as pure integer
    comparisons 10·cum ≤ 7·total via DECIMAL(38)/HUGEINT products
    (cumulative revenue × 10 outgrows bigint at planet scale). Share
    is the only double — one division of exact integers.
    """
    from locopy_spark.operators.ranking import global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            F.expr("cast(floor(l_extendedprice + 0.5) as bigint)")
        ).alias("r")
    )
    tot = rev.agg(F.sum("r").alias("tot"))
    ordered = global_running_sum(
        rev.select("l_partkey", "r", F.expr("-r").alias("negr")),
        order_cols=["negr", "l_partkey"],
        value_col="r",
        out_col="pre",
    )
    classed = ordered.crossJoin(F.broadcast(tot)).select(
        "r",
        "tot",
        F.expr(
            "CASE WHEN CAST(pre + r AS DECIMAL(38,0)) * 10"
            " <= CAST(tot AS DECIMAL(38,0)) * 7 THEN 'A'"
            " WHEN CAST(pre + r AS DECIMAL(38,0)) * 10"
            " <= CAST(tot AS DECIMAL(38,0)) * 9 THEN 'B'"
            " ELSE 'C' END"
        ).alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("r").alias("class_rev_fix"),
            F.expr(
                "CAST(SUM(r) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE)"
            ).alias("rev_share"),
        )
        .orderBy("abc_class")
    )


ORACLE["q_pareto_abc"] = f"""
  WITH rev AS (
    SELECT l_partkey,
           SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS r
    FROM lineitem GROUP BY 1
  ),
  tot AS (SELECT CAST(SUM(r) AS BIGINT) AS tot FROM rev),
  cum AS (
    SELECT r, tot,
           CAST(SUM(r) OVER (
             ORDER BY -r, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS c
    FROM rev, tot
  ),
  classed AS (
    SELECT r, tot,
           CASE WHEN CAST(c AS HUGEINT) * 10 <= CAST(tot AS HUGEINT) * 7
                THEN 'A'
                WHEN CAST(c AS HUGEINT) * 10 <= CAST(tot AS HUGEINT) * 9
                THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum
  )
  SELECT abc_class, COUNT(*) AS n_parts,
         CAST(SUM(r) AS BIGINT) AS class_rev_fix,
         CAST(SUM(r) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE) AS rev_share
  FROM classed GROUP BY 1 ORDER BY 1
"""


# -- weekday revenue uplift ---------------------------------------------------

def q_weekday_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day-of-week revenue index: average order value on day g
    vs the overall average, as the exact integer ppm
    (S_g · N · 10⁶) div (n_g · T) — 1,000,000 means "an average
    weekday". The day-of-week seasonality complement to q_autocorr's
    lag fingerprint, with the same engine-portable integer DOW
    ((epoch_day + 4) % 7, 0=Sunday — native dayofweek() numbering
    disagrees across engines).

    The ppm numerator S_g·N·10⁶ stays inside DECIMAL(38)/HUGEINT past
    10¹² orders; one partial-aggregated groupBy + a broadcast 1-row
    total, nothing else.
    """
    o = load_table(spark, sf_dir, "orders")
    return weekday_report(weekday_state(o))


def weekday_state(orders: DataFrame) -> DataFrame:
    """Additive per-DOW state ``(dow, n_orders, s)`` — counts and
    scaled revenue merge by key, so a streaming maintainer
    (``streaming.stateful.stream_weekday_uplift``) holds exactly
    this 7-row table."""
    dow = F.expr(
        "(datediff(cast(o_orderdate as date), date'1970-01-01') + 4) % 7"
    )
    v = F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
    return orders.groupBy(dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum(v).alias("s")
    )


def weekday_report(g: DataFrame) -> DataFrame:
    """The uplift finisher over the 7-row state — shared by the batch
    query and the streaming state view."""
    tot = g.agg(
        F.sum("n_orders").alias("n_all"), F.sum("s").alias("t")
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_orders",
            F.expr(f"CAST(s AS DOUBLE) / {SCALE}.0").alias("revenue"),
            F.expr(
                "CAST(CAST(s AS DECIMAL(38,0)) * n_all * 1000000"
                " div (CAST(n_orders AS DECIMAL(38,0)) * t) AS BIGINT)"
            ).alias("uplift_ppm"),
        )
        .orderBy("dow")
    )


ORACLE["q_weekday_uplift"] = f"""
  WITH g AS (
    SELECT (datediff('day', DATE '1970-01-01',
                     CAST(o_orderdate AS DATE)) + 4) % 7 AS dow,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS s
    FROM orders GROUP BY 1
  ),
  tot AS (
    SELECT CAST(SUM(n_orders) AS BIGINT) AS n_all,
           CAST(SUM(s) AS BIGINT) AS t
    FROM g
  )
  SELECT dow, n_orders,
         CAST(s AS DOUBLE) / {SCALE}.0 AS revenue,
         CAST(CAST(s AS HUGEINT) * n_all * 1000000
              // (CAST(n_orders AS HUGEINT) * t) AS BIGINT) AS uplift_ppm
  FROM g, tot ORDER BY dow
"""


# -- new vs returning customers ----------------------------------------------


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly new-vs-returning order split — the acquisition-vs-
    retention read every revenue dashboard opens with: an order is NEW
    when it falls in its customer's first active month, RETURNING
    after (reference locopy users run exactly this shape through
    ``execute``; cohort companion to q_retention_cohorts / q_cohort_ltv).

    Scale shape: per-customer first month is one partial-aggregated
    groupBy; the join back to orders co-partitions on the customer key
    (one shuffle each side); the monthly rollup is |months|-sized.
    Exact: linear month index, cents as bigints, the new-order share
    as an exact ppm floor division through DECIMAL(38)/HUGEINT.
    """
    o = load_table(spark, sf_dir, "orders")
    m_expr = "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1"
    base = o.select(
        "o_custkey",
        F.expr(m_expr).alias("m"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
            "cents"
        ),
    )
    first = base.groupBy("o_custkey").agg(F.min("m").alias("fm"))
    j = base.join(first, "o_custkey").withColumn(
        "is_new", F.expr("cast(m = fm as int)")
    )
    g = j.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("is_new").alias("n_new"),
        F.sum(F.expr("cast(is_new = 0 as bigint)")).alias("n_returning"),
        F.sum(F.expr("case when is_new = 1 then cents else 0 end")).alias(
            "new_c"
        ),
        F.sum(F.expr("case when is_new = 0 then cents else 0 end")).alias(
            "ret_c"
        ),
    )
    return g.select(
        "m",
        "n_orders",
        "n_new",
        "n_returning",
        F.expr(
            "CAST(CAST(n_new AS DECIMAL(38,0)) * 1000000"
            " div n_orders AS BIGINT)"
        ).alias("new_share_ppm"),
        F.expr("CAST(new_c AS DOUBLE) / 100.0").alias("new_revenue"),
        F.expr("CAST(ret_c AS DOUBLE) / 100.0").alias("returning_revenue"),
    ).orderBy("m")


ORACLE["q_new_vs_returning"] = """
  WITH base AS (
    SELECT o_custkey,
           (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS m,
           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
  ),
  first AS (SELECT o_custkey, MIN(m) AS fm FROM base GROUP BY 1),
  j AS (
    SELECT m, cents, CAST(m = fm AS INT) AS is_new
    FROM base JOIN first USING (o_custkey)
  ),
  g AS (
    SELECT m, COUNT(*) AS n_orders,
           CAST(SUM(is_new) AS BIGINT) AS n_new,
           CAST(SUM(CAST(is_new = 0 AS BIGINT)) AS BIGINT) AS n_returning,
           CAST(SUM(CASE WHEN is_new = 1 THEN cents ELSE 0 END)
                AS BIGINT) AS new_c,
           CAST(SUM(CASE WHEN is_new = 0 THEN cents ELSE 0 END)
                AS BIGINT) AS ret_c
    FROM j GROUP BY 1
  )
  SELECT m, n_orders, n_new, n_returning,
         CAST(CAST(n_new AS HUGEINT) * 1000000 // n_orders AS BIGINT)
           AS new_share_ppm,
         CAST(new_c AS DOUBLE) / 100.0 AS new_revenue,
         CAST(ret_c AS DOUBLE) / 100.0 AS returning_revenue
  FROM g ORDER BY m
"""


# -- backlog aging -------------------------------------------------------------

BACKLOG_BAND_DAYS = 90  # quarter-width aging bands


def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: for every non-finished order
    (o_orderstatus != 'F'), how old is it against the data horizon and
    how much value sits in each 90-day aging band per status — the
    working-capital / fulfillment-risk read an operations review runs
    weekly (old open orders are stuck orders).

    Exactness: age is pure datediff integer math against the 1-row
    broadcast horizon (max orderdate — the q_dormancy_curve
    convention: a pinned "today" makes the answer reproducible), the
    band id one floor division, value sums exact scaled bigints.
    Scale shape: ONE filtered scan (status predicate pushes to
    parquet) partial-aggregates straight to the |statuses × bands|-
    bounded state — an additive monoid. Nothing data-sized past the
    scan."""
    o = load_table(spark, sf_dir, "orders")
    return backlog_report(backlog_state(o), horizon_from=o)


def backlog_state(orders: DataFrame) -> DataFrame:
    """The additive backlog state ``(o_orderstatus, order_day,
    n_orders, value_c)``: open-order counts + exact scaled value per
    (status, epoch-day). A commutative monoid — the band assignment
    (which depends on the MOVING horizon) happens only in the
    finisher, so a streaming maintainer merges per-batch cells and
    re-bands on every read (the stream_dormancy convention:
    state stores absolute days, the report supplies "today")."""
    return (
        orders.filter("o_orderstatus != 'F'")
        .select(
            "o_orderstatus",
            F.expr(
                "datediff(cast(o_orderdate as date), date'1970-01-01')"
            ).alias("order_day"),
            F.expr(
                f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)"
            ).alias("value_c"),
        )
        .groupBy("o_orderstatus", "order_day")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("value_c").alias("value_c"),
        )
    )


def backlog_report(state: DataFrame, horizon_from: DataFrame) -> DataFrame:
    """Close the aging report over the backlog state: horizon = max
    orderdate of the FULL dataset — ``horizon_from`` is REQUIRED (all
    orders, not just open ones) so finished orders still move the
    clock; deriving the horizon from the open-order state alone would
    silently re-band against a stale horizon (ADVICE r7)."""
    mx = horizon_from.agg(
        F.max(
            F.expr("datediff(cast(o_orderdate as date), date'1970-01-01')")
        ).alias("mxd")
    )
    return (
        state.crossJoin(F.broadcast(mx))
        .select(
            "o_orderstatus",
            F.expr(f"(mxd - order_day) div {BACKLOG_BAND_DAYS}").alias(
                "age_band"
            ),
            "n_orders",
            "value_c",
        )
        .groupBy("o_orderstatus", "age_band")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.expr(f"CAST(SUM(value_c) AS DOUBLE) / {SCALE}.0").alias(
                "open_value"
            ),
        )
        .orderBy("o_orderstatus", "age_band")
    )


ORACLE["q_backlog_aging"] = f"""
  WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders)
  SELECT o_orderstatus,
         CAST(datediff('day', CAST(o_orderdate AS DATE), mx)
              // {BACKLOG_BAND_DAYS} AS BIGINT) AS age_band,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         {sql_exact_sum("o_totalprice", "open_value")}
  FROM orders, mx
  WHERE o_orderstatus != 'F'
  GROUP BY 1, 2 ORDER BY o_orderstatus, age_band
"""


# -- order fulfillment lag ------------------------------------------------------


def q_fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Order-to-first-ship lead-time distribution per order priority:
    days from order date to the EARLIEST line shipment, as a per-
    priority day histogram with exact ppm shares — the fulfillment-SLA
    read next to q12's late/on-time split (does URGENT actually ship
    faster, and by how much across the whole distribution?).

    One equi-join on the order key (the natural co-partitioning key —
    at 100x both sides bucket by it and the join plans exchange-free),
    a per-order MIN partial-aggregate, pure integer datediffs, and a
    \|priorities × days\|-bounded histogram; shares close as one ppm
    floor division against the broadcast per-priority total. Additive
    monoid past the per-order MIN.

    Split as state + finisher since r8: ``streaming.stateful.
    stream_fulfillment`` maintains the per-order MIN-ship state
    continuously over arriving lineitems; the histogram closes on
    demand."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return fulfillment_report(fulfillment_state(o, l))


def fulfillment_state(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The per-order fulfillment state ``(o_orderkey, o_orderpriority,
    od_day, fs_day)``: fs_day is the MIN epoch day any line of the
    order shipped — a per-key MIN monoid (the stream_survival
    convention: |orders|-sized honest state; the lag and its band
    derive only at read time because an earlier shipment can still
    arrive)."""
    fs = lineitem.groupBy("l_orderkey").agg(
        F.min(
            F.expr("datediff(cast(l_shipdate as date), date'1970-01-01')")
        ).alias("fs_day")
    )
    return orders.join(fs, orders.o_orderkey == fs.l_orderkey).select(
        "o_orderkey",
        "o_orderpriority",
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("od_day"),
        "fs_day",
    )


def fulfillment_report(state: DataFrame) -> DataFrame:
    """Close the per-priority lag histogram over the fulfillment
    state."""
    cells = (
        state.select(
            "o_orderpriority",
            F.expr("fs_day - od_day").alias("lag_days"),
        )
        .groupBy("o_orderpriority", "lag_days")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = cells.groupBy("o_orderpriority").agg(
        F.sum("n_orders").alias("n_pri")
    )
    return (
        cells.join(F.broadcast(tot), "o_orderpriority")
        .selectExpr(
            "o_orderpriority",
            "lag_days",
            "n_orders",
            "n_orders * 1000000 div n_pri as share_ppm",
        )
        .orderBy("o_orderpriority", "lag_days")
    )


ORACLE["q_fulfillment_lag"] = """
  WITH fs AS (
    SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
    FROM lineitem GROUP BY 1
  ),
  cells AS (
    SELECT o_orderpriority,
           CAST(datediff('day', CAST(o_orderdate AS DATE), first_ship)
                AS BIGINT) AS lag_days,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders JOIN fs ON o_orderkey = l_orderkey
    GROUP BY 1, 2
  )
  SELECT o_orderpriority, lag_days, n_orders,
         CAST(n_orders * 1000000 //
              SUM(n_orders) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS share_ppm
  FROM cells ORDER BY o_orderpriority, lag_days
"""


# -- customer value-decile migration -------------------------------------------


def q_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer value migration: for every pair of
    consecutive years, the 10×10 transition matrix of revenue deciles
    (customers active in BOTH years), with exact ppm row shares — the
    "are my top customers staying top" BI read that a static decile
    table (q_value_deciles) can't answer.

    Exactness: per-(customer, year) revenue is exact scaled cents; the
    within-year decile comes from the range-partitioned grouped rank
    ((rn−1)·10 div n + 1 — the q_lorenz_curve device, no
    one-task-per-year window); shares are ppm floor divisions.
    Scale shape: one partial-aggregated scan to the |customers ×
    years| state, ONE self-equi-join on (custkey, adjacent year) —
    both sides already co-keyed — then the |years × 100|-bounded
    rollup with a broadcast row-total join.

    Split as state + finisher since r8: ``streaming.stateful.
    stream_value_migration`` maintains the per-(customer, year)
    revenue monoid continuously; ranking and the transition matrix
    derive only at read time (a customer's decile moves as later
    orders land — ranking in-state would not be a monoid)."""
    return migration_report(
        migration_state(load_table(spark, sf_dir, "orders"))
    )


def migration_state(orders: DataFrame) -> DataFrame:
    """The per-(customer, year) revenue state ``(o_custkey, yr,
    rev_c)`` — exact scaled cents, a plain-sum monoid per key;
    |customers × years| rows forever."""
    return orders.groupBy(
        "o_custkey",
        F.expr("year(cast(o_orderdate as date))").alias("yr"),
    ).agg(
        F.sum(
            F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
        ).alias("rev_c")
    )


def migration_report(rev: DataFrame) -> DataFrame:
    """Close the decile transition matrix over the revenue state."""
    from locopy_spark.operators.ranking import grouped_global_row_number

    ranked = grouped_global_row_number(
        rev,
        group_cols=["yr"],
        order_cols=["rev_c", "o_custkey"],
        out_col="rn",
        size_col="n",
    ).select(
        "o_custkey",
        "yr",
        F.expr("(rn - 1) * 10 div n + 1").alias("dec"),
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cells = (
        a.join(
            b,
            F.expr("a.o_custkey = b.o_custkey AND b.yr = a.yr + 1"),
        )
        .select(
            F.expr("a.yr").alias("year_from"),
            F.expr("a.dec").alias("dec_from"),
            F.expr("b.dec").alias("dec_to"),
        )
        .groupBy("year_from", "dec_from", "dec_to")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    tot = cells.groupBy("year_from", "dec_from").agg(
        F.sum("n_customers").alias("n_row")
    )
    return (
        cells.join(F.broadcast(tot), ["year_from", "dec_from"])
        .selectExpr(
            "cast(year_from as bigint) as year_from",
            "dec_from",
            "dec_to",
            "n_customers",
            "n_customers * 1000000 div n_row as share_ppm",
        )
        .orderBy("year_from", "dec_from", "dec_to")
    )


ORACLE["q_value_migration"] = f"""
  WITH rev AS (
    SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr,
           CAST(SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT))
                AS BIGINT) AS rev_c
    FROM orders GROUP BY 1, 2
  ),
  ranked AS (
    SELECT o_custkey, yr,
           (ROW_NUMBER() OVER (
              PARTITION BY yr ORDER BY rev_c, o_custkey
            ) - 1) * 10
             // COUNT(*) OVER (PARTITION BY yr) + 1 AS dec
    FROM rev
  ),
  cells AS (
    SELECT a.yr AS year_from, a.dec AS dec_from, b.dec AS dec_to,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM ranked a JOIN ranked b
      ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
    GROUP BY 1, 2, 3
  )
  SELECT CAST(year_from AS BIGINT) AS year_from,
         CAST(dec_from AS BIGINT) AS dec_from,
         CAST(dec_to AS BIGINT) AS dec_to,
         n_customers,
         CAST(n_customers * 1000000 //
              SUM(n_customers) OVER (PARTITION BY year_from, dec_from)
              AS BIGINT) AS share_ppm
  FROM cells ORDER BY year_from, dec_from, dec_to
"""


# -- street price vs list price -------------------------------------------------

SVL_BAND_PPM = 100_000  # 10%-wide deviation bands
SVL_MAX_BAND = 20


def q_street_vs_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Street-vs-list price audit per brand: the distribution of
    realized unit price as a share of the part's list (retail) price,
    in 10%-wide ppm bands — the pricing-integrity read that catches a
    brand quietly selling far under list (channel leakage) or over it
    (stale list prices).

    Exactness: unit price closes as floor(extended/quantity·100+0.5)
    — double divide, scale, round-half-up floor, every step a
    correctly-rounded IEEE op identical cross-engine (the
    functions/vectors.py device); the deviation is one non-negative
    ppm floor division against the scaled list price, the band a
    second. Scale shape: ONE lineitem×part equi-join on the part key
    (dimension broadcasts at bench SF; co-partitions/buckets at 100x),
    then the \|brands × 21\|-bounded rollup with broadcast brand
    totals.

    Split as state + finisher since r8: the band is ROW-LOCAL (unit
    price vs the part's own list price), so the (brand, band) cell
    counts are themselves the additive state —
    ``streaming.stateful.stream_street_vs_list`` merges per-batch
    cells; only the shares close at read time."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return svl_report(svl_state(l, p))


def svl_state(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """The additive street-vs-list state ``(p_brand, band, n_lines)``:
    banding is row-local (each line against its own part's list
    price), so per-cell counts merge by key — |brands × 21| rows
    forever."""
    return (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand", "p_retailprice")),
            lineitem.l_partkey == part.p_partkey,
        )
        .select(
            "p_brand",
            F.expr(
                "least(cast(cast(floor(l_extendedprice / l_quantity * 100"
                " + 0.5) as bigint) * 1000000"
                f" div cast(floor(p_retailprice * 100 + 0.5) as bigint)"
                f" div {SVL_BAND_PPM} as bigint), {SVL_MAX_BAND})"
            ).alias("band"),
        )
        .groupBy("p_brand", "band")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


def svl_report(cells: DataFrame) -> DataFrame:
    """Close brand shares over the street-vs-list cell state."""
    tot = cells.groupBy("p_brand").agg(F.sum("n_lines").alias("n_brand"))
    return (
        cells.join(F.broadcast(tot), "p_brand")
        .selectExpr(
            "p_brand",
            "band",
            "n_lines",
            "n_lines * 1000000 div n_brand as share_ppm",
        )
        .orderBy("p_brand", "band")
    )


ORACLE["q_street_vs_list"] = f"""
  WITH cells AS (
    SELECT p_brand,
           LEAST(CAST(CAST(FLOOR(l_extendedprice / l_quantity * 100 + 0.5)
                           AS BIGINT) * 1000000
                      // CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
                      // {SVL_BAND_PPM} AS BIGINT), {SVL_MAX_BAND}) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
  )
  SELECT p_brand, band, n_lines,
         CAST(n_lines * 1000000 //
              SUM(n_lines) OVER (PARTITION BY p_brand) AS BIGINT)
           AS share_ppm
  FROM cells ORDER BY p_brand, band
"""


# -- price-volume-mix revenue bridge ---------------------------------------------


def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge per brand (price-volume-mix): the
    finance decomposition ΔRev = volume effect + price effect +
    residual between the LAST TWO years in the data — "did we sell
    more units, or the same units dearer?", the first question any
    revenue review asks of a delta.

    Standard PVM convention: volume = (q₂−q₁)·p₁, price = q₂·(p₂−p₁),
    residual = Δ − volume − price (closes EXACTLY by construction —
    the floor dropped by the integer unit prices lands in the
    residual, identically on both engines). Revenue is exact
    discounted cents; unit prices are floor divisions guarded for
    brands absent in a year (q=0 → effects NULL, the 'new'/'exit'
    rows). One partial-aggregated lineitem scan with a broadcast part
    join to the |brands × 2| state; the bridge is a self-join of that
    bounded table."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    by = (
        l.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            l.l_partkey == p.p_partkey,
        )
        .groupBy(
            "p_brand",
            F.expr("year(cast(l_shipdate as date))").alias("yr"),
        )
        .agg(
            F.sum(
                F.expr(
                    "cast(floor(l_extendedprice * (1 - l_discount) * 100"
                    " + 0.5) as bigint)"
                )
            ).alias("rev_c"),
            F.sum(F.expr("cast(floor(l_quantity + 0.5) as bigint)")).alias(
                "qty"
            ),
        )
    )
    yrs = by.agg(F.max("yr").alias("y2")).select(
        "y2", F.expr("y2 - 1").alias("y1")
    )
    a = by.crossJoin(F.broadcast(yrs)).filter("yr = y1").select(
        "p_brand", F.col("rev_c").alias("rev1_c"), F.col("qty").alias("q1")
    )
    b = by.crossJoin(F.broadcast(yrs)).filter("yr = y2").select(
        "p_brand", F.col("rev_c").alias("rev2_c"), F.col("qty").alias("q2")
    )
    # union + SUM groupBy instead of a full-outer join (r12): BHJ
    # cannot take FULL OUTER, so the two |brands|-bounded year slices
    # paid a sort-merge join; each brand appears at most once per
    # side, so 0-padding + SUM reproduces the coalesce exactly.
    both = (
        a.selectExpr(
            "p_brand", "rev1_c", "q1",
            "CAST(0 AS BIGINT) AS rev2_c", "CAST(0 AS BIGINT) AS q2",
        )
        .unionByName(
            b.selectExpr(
                "p_brand", "CAST(0 AS BIGINT) AS rev1_c",
                "CAST(0 AS BIGINT) AS q1", "rev2_c", "q2",
            )
        )
        .groupBy("p_brand")
        .agg(
            F.sum("rev1_c").alias("rev1_c"),
            F.sum("q1").alias("q1"),
            F.sum("rev2_c").alias("rev2_c"),
            F.sum("q2").alias("q2"),
        )
    )
    return (
        both.selectExpr(
            "p_brand",
            "rev1_c",
            "rev2_c",
            "rev2_c - rev1_c as delta_c",
            "case when q1 > 0 and q2 > 0 then"
            " (q2 - q1) * (rev1_c div q1) end as volume_c",
            "case when q1 > 0 and q2 > 0 then"
            " q2 * (rev2_c div q2 - rev1_c div q1) end as price_c",
            "case when q1 > 0 and q2 > 0 then"
            " (rev2_c - rev1_c) - (q2 - q1) * (rev1_c div q1)"
            " - q2 * (rev2_c div q2 - rev1_c div q1) end as residual_c",
            "case when q1 = 0 then 'new' when q2 = 0 then 'exit'"
            " else 'continuing' end as bridge_class",
        )
        .orderBy("p_brand")
    )


ORACLE["q_revenue_bridge"] = """
  WITH by_y AS (
    SELECT p_brand, year(CAST(l_shipdate AS DATE)) AS yr,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS rev_c,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2
  ),
  yrs AS (SELECT MAX(yr) AS y2, MAX(yr) - 1 AS y1 FROM by_y),
  a AS (
    SELECT p_brand, rev_c AS rev1_c, qty AS q1
    FROM by_y, yrs WHERE yr = y1
  ),
  b AS (
    SELECT p_brand, rev_c AS rev2_c, qty AS q2
    FROM by_y, yrs WHERE yr = y2
  ),
  pair AS (
    SELECT COALESCE(a.p_brand, b.p_brand) AS p_brand,
           COALESCE(rev1_c, 0) AS rev1_c, COALESCE(q1, 0) AS q1,
           COALESCE(rev2_c, 0) AS rev2_c, COALESCE(q2, 0) AS q2
    FROM a FULL OUTER JOIN b ON a.p_brand = b.p_brand
  )
  SELECT p_brand, rev1_c, rev2_c, rev2_c - rev1_c AS delta_c,
         CASE WHEN q1 > 0 AND q2 > 0 THEN
           (q2 - q1) * (rev1_c // q1) END AS volume_c,
         CASE WHEN q1 > 0 AND q2 > 0 THEN
           q2 * (rev2_c // q2 - rev1_c // q1) END AS price_c,
         CASE WHEN q1 > 0 AND q2 > 0 THEN
           (rev2_c - rev1_c) - (q2 - q1) * (rev1_c // q1)
           - q2 * (rev2_c // q2 - rev1_c // q1) END AS residual_c,
         CASE WHEN q1 = 0 THEN 'new' WHEN q2 = 0 THEN 'exit'
              ELSE 'continuing' END AS bridge_class
  FROM pair ORDER BY p_brand
"""


# -- matched-part price indices ---------------------------------------------------


def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year Laspeyres / Paasche / Fisher price indices over
    the matched-part basket — the economics companion to
    q_revenue_bridge: the bridge decomposes ONE year pair per brand,
    the index chain tracks pure price change across EVERY consecutive
    year pair holding the basket fixed (base-year weights =
    Laspeyres, current-year weights = Paasche, Fisher their geometric
    mean — the textbook bias bracket).

    Exactness: per-(part, year) discounted revenue is exact cents and
    quantities exact integers from ONE partial-aggregated lineitem
    scan; unit prices are micro-cent floor divisions (rev_c·10⁴ div
    qty — exact on both engines); the four index sums widen through
    DECIMAL(38)/HUGEINT cross-products of exact integers; each index
    closes as ONE ppm floor division and Fisher is the single double
    (IEEE sqrt of a product of two exact ppm integers — correctly
    rounded, portable). Scale shape: the |parts × years| state
    self-equi-joins on (partkey, adjacent year) — both sides co-keyed
    — then a |years|-bounded rollup. Nothing data-sized after the
    first scan.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's finance/operations family.

    Split as state + finisher since r8: ``streaming.stateful.
    stream_price_index`` maintains the per-(part, year) (rev_c, qty)
    monoid continuously; unit prices and the matched-basket chain
    derive only at read time (a part-year's unit price keeps moving
    as lines arrive)."""
    return price_index_report(
        price_index_state(load_table(spark, sf_dir, "lineitem"))
    )


def price_index_state(lineitem: DataFrame) -> DataFrame:
    """The per-(part, year) state ``(l_partkey, yr, rev_c, qty)`` —
    exact discounted cents + exact integer quantities, both plain-sum
    monoids; |parts × years| rows forever."""
    return lineitem.groupBy(
        "l_partkey",
        F.expr("year(cast(l_shipdate as date))").alias("yr"),
    ).agg(
        F.sum(
            F.expr(
                "cast(floor(l_extendedprice * (1 - l_discount) * 100"
                " + 0.5) as bigint)"
            )
        ).alias("rev_c"),
        F.sum(F.expr("cast(floor(l_quantity + 0.5) as bigint)")).alias(
            "qty"
        ),
    )


def price_index_report(state: DataFrame) -> DataFrame:
    """Close the Laspeyres/Paasche/Fisher chain over the (part, year)
    state: unit prices are micro-cent floor divisions derived HERE
    (not in the state — they move as lines arrive), then the
    adjacent-year matched join and the |years|-bounded rollup."""
    py = state.select(
        "l_partkey",
        "yr",
        "qty",
        F.expr("rev_c * 10000 div qty").alias("pu"),
    )
    a, b = py.alias("a"), py.alias("b")
    matched = a.join(
        b, F.expr("a.l_partkey = b.l_partkey AND b.yr = a.yr + 1")
    ).select(
        F.expr("b.yr").alias("year"),
        F.expr("a.pu").alias("pu0"),
        F.expr("a.qty").alias("q0"),
        F.expr("b.pu").alias("pu1"),
        F.expr("b.qty").alias("q1"),
    )
    agg = matched.groupBy("year").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.expr("SUM(CAST(pu1 AS DECIMAL(38,0)) * q0)").alias("ln_"),
        F.expr("SUM(CAST(pu0 AS DECIMAL(38,0)) * q0)").alias("ld"),
        F.expr("SUM(CAST(pu1 AS DECIMAL(38,0)) * q1)").alias("pn"),
        F.expr("SUM(CAST(pu0 AS DECIMAL(38,0)) * q1)").alias("pd"),
    )
    return (
        agg.selectExpr(
            "cast(year as bigint) as year",
            "n_parts",
            "CAST(ln_ * 1000000 div ld AS BIGINT) AS laspeyres_ppm",
            "CAST(pn * 1000000 div pd AS BIGINT) AS paasche_ppm",
        )
        .selectExpr(
            "year",
            "n_parts",
            "laspeyres_ppm",
            "paasche_ppm",
            "sqrt(CAST(laspeyres_ppm AS DOUBLE)"
            " * CAST(paasche_ppm AS DOUBLE)) AS fisher_ppm",
        )
        .orderBy("year")
    )


ORACLE["q_price_index"] = """
  WITH py AS (
    SELECT l_partkey, year(CAST(l_shipdate AS DATE)) AS yr,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
             AS qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) * 10000
                // SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT))
                AS BIGINT) AS pu
    FROM lineitem GROUP BY 1, 2
  ),
  matched AS (
    SELECT b.yr AS year, a.pu AS pu0, a.qty AS q0, b.pu AS pu1,
           b.qty AS q1
    FROM py a JOIN py b
      ON a.l_partkey = b.l_partkey AND b.yr = a.yr + 1
  ),
  agg AS (
    SELECT year, CAST(COUNT(*) AS BIGINT) AS n_parts,
           SUM(CAST(pu1 AS HUGEINT) * q0) AS ln_,
           SUM(CAST(pu0 AS HUGEINT) * q0) AS ld,
           SUM(CAST(pu1 AS HUGEINT) * q1) AS pn,
           SUM(CAST(pu0 AS HUGEINT) * q1) AS pd
    FROM matched GROUP BY 1
  )
  SELECT CAST(year AS BIGINT) AS year, n_parts,
         CAST(ln_ * 1000000 // ld AS BIGINT) AS laspeyres_ppm,
         CAST(pn * 1000000 // pd AS BIGINT) AS paasche_ppm,
         sqrt(CAST(ln_ * 1000000 // ld AS DOUBLE)
              * CAST(pn * 1000000 // pd AS DOUBLE)) AS fisher_ppm
  FROM agg ORDER BY year
"""


# -- ABC × XYZ inventory classification matrix -----------------------------------

XYZ_X_PPM = 250_000  # CV² ≤ 0.25 (CV ≤ 0.5) → X
XYZ_Y_PPM = 1_000_000  # CV² ≤ 1.00 (CV ≤ 1.0) → Y, else Z


def q_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC × XYZ inventory matrix: revenue importance (the q_pareto_abc
    70/90 cumulative-share classes) crossed with demand variability
    (CV² of monthly demand INCLUDING zero months, banded X ≤ 0.25,
    Y ≤ 1.0, else Z) — the planning grid that says "A-X: automate
    replenishment; A-Z: hold safety stock and watch it" which neither
    axis gives alone.

    Exactness: ONE lineitem scan to the (part, month) demand grid
    carrying BOTH quantity and revenue sums; per-part rollups are
    plain integer sums; CV² is the q_burstiness DECIMAL(38)/HUGEINT
    device with n = the GLOBAL month count (missing months are real
    zero-demand months — a part selling one huge month and nothing
    else must land in Z); ABC is the exact prefix-sum construction
    shared with q_pareto_abc; part shares are ppm floor divisions and
    revenue the exact-sum double. Scale shape: grid-sized shuffles
    only, one range-partitioned prefix sum, broadcast scalars,
    ≤9-row output.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's operations family.

    Split as state + finisher since r8: the (part, month) demand grid
    is a plain-sum monoid (``streaming.stateful.stream_abc_xyz``
    maintains it live); CV², classes and the prefix-sum ABC all
    derive only at read time — every one of them moves as lines
    arrive."""
    return abc_xyz_report(
        abc_xyz_state(load_table(spark, sf_dir, "lineitem"))
    )


def abc_xyz_state(lineitem: DataFrame) -> DataFrame:
    """The (part, month) demand grid ``(l_partkey, ym, q, r)`` — both
    measures plain-sum monoids; |parts × months| rows forever."""
    return lineitem.groupBy(
        "l_partkey",
        F.expr(
            "year(cast(l_shipdate as date)) * 100"
            " + month(cast(l_shipdate as date))"
        ).alias("ym"),
    ).agg(
        F.sum(F.expr("cast(floor(l_quantity + 0.5) as bigint)")).alias("q"),
        F.sum(
            F.expr("cast(floor(l_extendedprice + 0.5) as bigint)")
        ).alias("r"),
    )


def abc_xyz_report(pm: DataFrame) -> DataFrame:
    """Close the ABC × XYZ matrix over the demand grid."""
    from locopy_spark.operators.ranking import global_running_sum

    nm = pm.agg(F.countDistinct("ym").alias("nm"))
    per_part = pm.groupBy("l_partkey").agg(
        F.sum("q").alias("sx"),
        F.sum(F.expr("CAST(q AS DECIMAL(38,0)) * q")).alias("sxx"),
        F.sum("r").alias("r"),
    )
    cv2 = (
        "CASE WHEN sx = 0 THEN 0 ELSE"
        " CAST((CAST(nm AS DECIMAL(38,0)) * sxx"
        "       - CAST(sx AS DECIMAL(38,0)) * sx) * 1000000"
        " div (CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT) END"
    )
    # persisted (r11): the |parts|-sized class table feeds THREE
    # consumers (the revenue total, the prefix-sum device input AND its
    # range-boundary sampling pass) — un-persisted, each replayed the
    # whole lineitem→grid→per-part chain
    xyz = managed_persist(
        per_part.crossJoin(F.broadcast(nm)).select(
            "l_partkey",
            "r",
            F.expr(
                f"CASE WHEN ({cv2}) <= {XYZ_X_PPM} THEN 'X'"
                f" WHEN ({cv2}) <= {XYZ_Y_PPM} THEN 'Y'"
                " ELSE 'Z' END"
            ).alias("xyz_class"),
        ),
        "abc_xyz",
    )
    tot = xyz.agg(
        F.sum("r").alias("tot"), F.count(F.lit(1)).alias("n_parts_all")
    )
    ordered = global_running_sum(
        xyz.select(
            "l_partkey", "xyz_class", "r", F.expr("-r").alias("negr")
        ),
        order_cols=["negr", "l_partkey"],
        value_col="r",
        out_col="pre",
    )
    classed = ordered.crossJoin(F.broadcast(tot)).select(
        "xyz_class",
        "r",
        "n_parts_all",
        F.expr(
            "CASE WHEN CAST(pre + r AS DECIMAL(38,0)) * 10"
            " <= CAST(tot AS DECIMAL(38,0)) * 7 THEN 'A'"
            " WHEN CAST(pre + r AS DECIMAL(38,0)) * 10"
            " <= CAST(tot AS DECIMAL(38,0)) * 9 THEN 'B'"
            " ELSE 'C' END"
        ).alias("abc_class"),
    )
    return (
        classed.groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.max("n_parts_all").alias("n_all"),
            F.sum("r").alias("rev_u"),
        )
        .selectExpr(
            "abc_class",
            "xyz_class",
            "n_parts",
            "n_parts * 1000000 div n_all AS parts_share_ppm",
            "CAST(rev_u AS DOUBLE) AS revenue",
        )
        .orderBy("abc_class", "xyz_class")
    )


ORACLE["q_abc_xyz"] = f"""
  WITH pm AS (
    SELECT l_partkey,
           year(CAST(l_shipdate AS DATE)) * 100
             + month(CAST(l_shipdate AS DATE)) AS ym,
           SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS q,
           SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS r
    FROM lineitem GROUP BY 1, 2
  ),
  nmt AS (SELECT COUNT(DISTINCT ym) AS nm FROM pm),
  per_part AS (
    SELECT l_partkey, SUM(q) AS sx,
           SUM(CAST(q AS HUGEINT) * q) AS sxx, SUM(r) AS r
    FROM pm GROUP BY 1
  ),
  xyz AS (
    SELECT l_partkey, r,
           CASE WHEN cv2 <= {XYZ_X_PPM} THEN 'X'
                WHEN cv2 <= {XYZ_Y_PPM} THEN 'Y' ELSE 'Z' END AS xyz_class
    FROM (
      SELECT l_partkey, r,
             CASE WHEN sx = 0 THEN 0 ELSE
               CAST((CAST(nm AS HUGEINT) * sxx
                     - CAST(sx AS HUGEINT) * sx) * 1000000
                    // (CAST(sx AS HUGEINT) * sx) AS BIGINT) END AS cv2
      FROM per_part, nmt
    )
  ),
  tot AS (
    SELECT SUM(r) AS tot, CAST(COUNT(*) AS BIGINT) AS n_parts_all
    FROM xyz
  ),
  classed AS (
    SELECT xyz_class, r, n_parts_all,
           CASE WHEN CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) * 10 <= CAST(tot AS HUGEINT) * 7 THEN 'A'
                WHEN CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS HUGEINT) * 10 <= CAST(tot AS HUGEINT) * 9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM xyz, tot
  )
  SELECT abc_class, xyz_class,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(COUNT(*) * 1000000 // MAX(n_parts_all) AS BIGINT)
           AS parts_share_ppm,
         CAST(SUM(r) AS DOUBLE) AS revenue
  FROM classed GROUP BY 1, 2 ORDER BY abc_class, xyz_class
"""


# -- returns vs discount odds ratio -----------------------------------------------

OR_DISC_CUT = 0.05  # "deep discount" exposure threshold


def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio + relative risk of a line being RETURNED given a
    deep discount (> {OR_DISC_CUT}) — the 2×2 epidemiology panel
    pointed at the returns question ("are we discounting our way into
    returns?") that q_cramers_v's full-table association can't answer
    about one specific exposure.

    Exactness: one conditional-aggregate pass collapses lineitem to a
    1-row 2×2 table (a=exposed·returned, b=exposed·kept, c=unexposed·
    returned, d=unexposed·kept — a pure additive monoid, the
    stream_anova shape); OR = ad/bc and RR = a(c+d)/c(a+b) close as
    exact ppm floor divisions through DECIMAL(38)/HUGEINT with
    greatest(·,1) zero-cell guards. Scale shape: one scan, one row,
    row-local closure.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's statistics family.
    """
    return odds_report(odds_state(load_table(spark, sf_dir, "lineitem")))


def odds_state(lineitem: DataFrame) -> DataFrame:
    """The 1-row additive 2×2 state (a, b, c, d)."""
    exposed = f"l_discount > {OR_DISC_CUT}"
    returned = "l_returnflag = 'R'"
    return lineitem.agg(
        F.sum(
            F.expr(f"case when {exposed} and {returned} then 1 else 0 end")
        ).alias("a"),
        F.sum(
            F.expr(
                f"case when {exposed} and not ({returned}) then 1 else 0 end"
            )
        ).alias("b"),
        F.sum(
            F.expr(
                f"case when not ({exposed}) and {returned} then 1 else 0 end"
            )
        ).alias("c"),
        F.sum(
            F.expr(
                f"case when not ({exposed}) and not ({returned})"
                " then 1 else 0 end"
            )
        ).alias("d"),
    )


def odds_report(state: DataFrame) -> DataFrame:
    """Close OR/RR over the 2×2 state as exact ppm floor divisions."""
    return state.selectExpr(
        "a",
        "b",
        "c",
        "d",
        "CAST(CAST(a AS DECIMAL(38,0)) * d * 1000000"
        " div greatest(CAST(b AS DECIMAL(38,0)) * c, 1) AS BIGINT)"
        " AS odds_ratio_ppm",
        "CAST(CAST(a AS DECIMAL(38,0)) * (c + d) * 1000000"
        " div greatest(CAST(c AS DECIMAL(38,0)) * (a + b), 1) AS BIGINT)"
        " AS rel_risk_ppm",
    )


ORACLE["q_odds_ratio"] = f"""
  WITH s AS (
    SELECT
      SUM(CASE WHEN l_discount > {OR_DISC_CUT} AND l_returnflag = 'R'
               THEN 1 ELSE 0 END) AS a,
      SUM(CASE WHEN l_discount > {OR_DISC_CUT} AND l_returnflag != 'R'
               THEN 1 ELSE 0 END) AS b,
      SUM(CASE WHEN l_discount <= {OR_DISC_CUT} AND l_returnflag = 'R'
               THEN 1 ELSE 0 END) AS c,
      SUM(CASE WHEN l_discount <= {OR_DISC_CUT} AND l_returnflag != 'R'
               THEN 1 ELSE 0 END) AS d
    FROM lineitem
  )
  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
         CAST(CAST(a AS HUGEINT) * d * 1000000
              // GREATEST(CAST(b AS HUGEINT) * c, 1) AS BIGINT)
           AS odds_ratio_ppm,
         CAST(CAST(a AS HUGEINT) * (c + d) * 1000000
              // GREATEST(CAST(c AS HUGEINT) * (a + b), 1) AS BIGINT)
           AS rel_risk_ppm
  FROM s
"""


# -- Croston intermittent-demand forecast ------------------------------------------

CROSTON_MIN_DEMANDS = 3


def q_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per part — the method of
    record for the sparse/lumpy Z-class demand q_abc_xyz isolates
    (plain exponential smoothing biases toward zero on mostly-zero
    series; Croston smooths demand SIZE and inter-demand INTERVAL
    separately and forecasts their ratio).

    Engine-exact (the q_holt_linear device): both recurrences are
    α=½ halvings on exact integers over the shared ``abc_xyz_state``
    (part, month) grid —

        z_k = ⌊(d_k + z_{k−1}) / 2⌋        (z_1 = d_1)
        p_k = ⌊(i_k + p_{k−1}) / 2⌋        (p_1 = 1 by convention)

    with i_k the linear-month gap between consecutive demands;
    the demand rate closes as ONE exact ppm floor division z·10⁶ div
    p. The inherently-sequential recurrences run as per-part Arrow
    tasks (groups are ≤|months| rows — parallel across parts, bounded
    within); the DuckDB twin is a per-part recursive CTE over the
    identical halvings. Parts with < {CROSTON_MIN_DEMANDS} demand
    months are excluded on both engines.
    """
    return croston_report(abc_xyz_state(load_table(spark, sf_dir, "lineitem")))


def croston_report(pm: DataFrame) -> DataFrame:
    """Close Croston over any (l_partkey, ym, q, …) demand grid —
    SECOND finisher on the stream_abc_xyz state."""
    nz = pm.filter("q > 0").select(
        "l_partkey",
        F.expr("(ym div 100) * 12 + (ym % 100)").alias("t"),
        "q",
    )

    def croston(pdf):
        # one Arrow task per HASH BUCKET of parts, not per part: a
        # per-part task pays ~20k pandas constructions for trivial
        # per-group work (measured 10 s at sf0.1); one sorted pass
        # over the bucket's rows runs the identical exact recurrence
        # in 128 parallel tasks (~3x faster end-to-end, same output)
        import pandas as pd

        pdf = pdf.sort_values(["l_partkey", "t"])
        keys, ns, zs, ps = [], [], [], []
        cur = z = p = prev_t = n = None
        for k, t, d in zip(
            pdf["l_partkey"].tolist(), pdf["t"].tolist(), pdf["q"].tolist()
        ):
            if k != cur:
                if cur is not None:
                    keys.append(cur); ns.append(n); zs.append(z); ps.append(p)
                cur, z, p, n, prev_t = k, int(d), 1, 1, int(t)
            else:
                z = (int(d) + z) // 2
                p = ((int(t) - prev_t) + p) // 2
                n += 1
                prev_t = int(t)
        if cur is not None:
            keys.append(cur); ns.append(n); zs.append(z); ps.append(p)
        return pd.DataFrame(
            {"l_partkey": keys, "n_demands": ns, "z_fix": zs, "p_fix": ps}
        )

    out = (
        nz.withColumn("__b", F.expr("pmod(hash(l_partkey), 128)"))
        .groupBy("__b")
        .applyInPandas(
            croston,
            "l_partkey long, n_demands long, z_fix long, p_fix long",
        )
    )
    return (
        out.filter(f"n_demands >= {CROSTON_MIN_DEMANDS}")
        .selectExpr(
            "l_partkey",
            "n_demands",
            "z_fix",
            "p_fix",
            "z_fix * 1000000 div p_fix AS croston_rate_ppm",
        )
        .orderBy("l_partkey")
    )


ORACLE["q_croston"] = f"""
  WITH RECURSIVE pm AS (
    SELECT l_partkey,
           year(CAST(l_shipdate AS DATE)) * 100
             + month(CAST(l_shipdate AS DATE)) AS ym,
           SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS q
    FROM lineitem GROUP BY 1, 2
  ),
  nz AS (
    SELECT l_partkey, (ym // 100) * 12 + (ym % 100) AS t, q
    FROM pm WHERE q > 0
  ),
  idx AS (
    SELECT l_partkey, t, q,
           ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY t) AS k,
           t - LAG(t) OVER (PARTITION BY l_partkey ORDER BY t) AS iv
    FROM nz
  ),
  cnt AS (SELECT l_partkey, COUNT(*) AS n FROM nz GROUP BY 1),
  cro(l_partkey, k, z, p) AS (
    SELECT l_partkey, k, CAST(q AS BIGINT), CAST(1 AS BIGINT)
    FROM idx WHERE k = 1
    UNION ALL
    SELECT i.l_partkey, i.k,
           CAST(FLOOR((i.q + c.z) / 2.0) AS BIGINT),
           CAST(FLOOR((i.iv + c.p) / 2.0) AS BIGINT)
    FROM idx i JOIN cro c
      ON i.l_partkey = c.l_partkey AND i.k = c.k + 1
  )
  SELECT c.l_partkey, CAST(cnt.n AS BIGINT) AS n_demands,
         c.z AS z_fix, c.p AS p_fix,
         CAST(c.z * 1000000 // c.p AS BIGINT) AS croston_rate_ppm
  FROM cro c JOIN cnt ON c.l_partkey = cnt.l_partkey
  WHERE c.k = cnt.n AND cnt.n >= {CROSTON_MIN_DEMANDS}
  ORDER BY c.l_partkey
"""


# -- demand obsolescence (EOL) flags ------------------------------------------------

EOL_FACTOR = 3  # dormant for > 3x the part's own demand rhythm


def q_demand_obsolete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-life demand flags: parts whose silence since their LAST
    demand month exceeds {EOL_FACTOR}× their own average inter-demand
    interval — the "stop restocking this" list that a fixed dormancy
    cutoff gets wrong in both directions (a weekly seller silent for
    two months is dead; a twice-a-year seller silent for two months is
    routine). THIRD finisher on the shared (part, month) demand grid
    (q_abc_xyz classifies, q_croston forecasts, this retires).

    Exactness: pure integer cross-multiplication — silent·(n−1) >
    {EOL_FACTOR}·span with span = t_last − t_first (no ADI division
    anywhere); the reported adi_ppm/silent months are exact ppm floor
    divisions; the horizon is the grid's global max month (broadcast
    1-row). Only parts with ≥ 2 demand months have a rhythm to
    violate; output is the flagged list ordered by part.
    """
    return obsolete_report(
        abc_xyz_state(load_table(spark, sf_dir, "lineitem"))
    )


def obsolete_report(pm: DataFrame) -> DataFrame:
    """Close the EOL scan over any (l_partkey, ym, q, …) demand grid."""
    nz = pm.filter("q > 0").select(
        "l_partkey",
        F.expr("(ym div 100) * 12 + (ym % 100)").alias("t"),
    )
    per = nz.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("t").alias("t_first"),
        F.max("t").alias("t_last"),
    )
    mx = nz.agg(F.max("t").alias("t_now"))
    return (
        per.crossJoin(F.broadcast(mx))
        .filter(
            "n >= 2 AND (t_now - t_last) * (n - 1)"
            f" > {EOL_FACTOR} * (t_last - t_first)"
        )
        .selectExpr(
            "l_partkey",
            "n AS n_demands",
            "t_now - t_last AS silent_months",
            "(t_last - t_first) * 1000000 div (n - 1) AS adi_ppm",
        )
        .orderBy("l_partkey")
    )


ORACLE["q_demand_obsolete"] = f"""
  WITH pm AS (
    SELECT l_partkey,
           year(CAST(l_shipdate AS DATE)) * 100
             + month(CAST(l_shipdate AS DATE)) AS ym,
           SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS q
    FROM lineitem GROUP BY 1, 2
  ),
  nz AS (
    SELECT l_partkey, (ym // 100) * 12 + (ym % 100) AS t
    FROM pm WHERE q > 0
  ),
  per AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(t) AS t_first, MAX(t) AS t_last
    FROM nz GROUP BY 1
  ),
  mx AS (SELECT MAX(t) AS t_now FROM nz)
  SELECT l_partkey, n AS n_demands,
         CAST(t_now - t_last AS BIGINT) AS silent_months,
         CAST((t_last - t_first) * 1000000 // (n - 1) AS BIGINT)
           AS adi_ppm
  FROM per, mx
  WHERE n >= 2 AND (t_now - t_last) * (n - 1)
        > {EOL_FACTOR} * (t_last - t_first)
  ORDER BY l_partkey
"""


# -- newsvendor critical-fractile stocking quantity ---------------------------------

NV_NUM, NV_DEN = 4, 5  # critical fractile cu/(cu+co) = 4/5
NV_MIN_MONTHS = 6


def q_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking quantity per part: the smallest monthly
    order-up-to level covering the {NV_NUM}/{NV_DEN} critical fractile
    of the part's OWN demand-month distribution — the "how much to
    stock" answer that closes the planning loop q_abc_xyz opens
    (classify) and q_croston continues (forecast a rate): the
    newsvendor quantile is the textbook optimal under-/over-stock
    trade-off, and on lumpy demand it is NOT a scaled mean. FOURTH
    finisher on the shared ``abc_xyz_state`` (part, month) demand grid.

    Exactness: Q* is a pure ORDER STATISTIC — the ⌈n·{NV_NUM}/{NV_DEN}⌉-th
    smallest monthly demand, k = ({NV_NUM}n + {NV_DEN - 1}) div {NV_DEN}
    in integers, selected by a per-part row_number over the
    |months|-bounded grid with a deterministic (q, ym) tie order; the
    cover ratio Q*·n·10⁶ div Σq is ONE exact ppm floor division. Only
    parts with ≥ {NV_MIN_MONTHS} demand months are scored (conditional-
    on-demand fractile, the q_croston demand-month convention).
    Scale shape: one partial-aggregated scan to the grid, one bounded
    per-part window — nothing data-sized past the first scan.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's operations-planning family.
    """
    return newsvendor_report(
        abc_xyz_state(load_table(spark, sf_dir, "lineitem"))
    )


def newsvendor_report(pm: DataFrame) -> DataFrame:
    """Close the newsvendor quantile over any (l_partkey, ym, q, …)
    demand grid — FOURTH finisher on the stream_abc_xyz state."""
    nz = pm.filter("q > 0").select("l_partkey", "ym", "q")
    w_rn = W.partitionBy("l_partkey").orderBy("q", "ym")
    w_all = W.partitionBy("l_partkey")
    scored = nz.select(
        "l_partkey",
        "q",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("q").over(w_all).alias("sq"),
    )
    return (
        scored.filter(
            f"n >= {NV_MIN_MONTHS}"
            f" AND rn = ({NV_NUM} * n + {NV_DEN - 1}) div {NV_DEN}"
        )
        .selectExpr(
            "l_partkey",
            "n AS n_months",
            "q AS q_star",
            "CAST(CAST(q AS DECIMAL(38,0)) * n * 1000000"
            " div sq AS BIGINT) AS cover_ppm",
        )
        .orderBy("l_partkey")
    )


ORACLE["q_newsvendor"] = f"""
  WITH pm AS (
    SELECT l_partkey,
           year(CAST(l_shipdate AS DATE)) * 100
             + month(CAST(l_shipdate AS DATE)) AS ym,
           SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS q
    FROM lineitem GROUP BY 1, 2
  ),
  nz AS (SELECT l_partkey, ym, q FROM pm WHERE q > 0),
  scored AS (
    SELECT l_partkey, q,
           ROW_NUMBER() OVER (PARTITION BY l_partkey
                              ORDER BY q, ym) AS rn,
           COUNT(*) OVER (PARTITION BY l_partkey) AS n,
           SUM(q) OVER (PARTITION BY l_partkey) AS sq
    FROM nz
  )
  SELECT l_partkey,
         CAST(n AS BIGINT) AS n_months,
         CAST(q AS BIGINT) AS q_star,
         CAST(CAST(q AS HUGEINT) * n * 1000000 // sq AS BIGINT)
           AS cover_ppm
  FROM scored
  WHERE n >= {NV_MIN_MONTHS}
    AND rn = ({NV_NUM} * n + {NV_DEN - 1}) // {NV_DEN}
  ORDER BY l_partkey
"""


# -- Little's-law flow audit --------------------------------------------------------


def q_little_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law flow audit per month: average work-in-progress
    (open orders), completion throughput, and BOTH cycle-time reads —
    the one implied by L = λ·W from WIP and throughput, and the one
    measured directly from completed orders — side by side. When the
    two diverge the flow is non-stationary (WIP building up or
    draining), which is exactly what an operations review wants
    flagged; q_backlog_aging shows the queue's age NOW, this shows
    the conservation law OVER TIME.

    An order is in progress from its order date through its LAST ship
    day (MAX over lines — the q_fulfillment_lag complement, which
    takes the first). Exactness: per-order intervals explode to a
    month spine (sequence/generate_series — ≤ a few rows per order,
    never day-level), in-month overlap is pure date arithmetic on
    both engines, and all three ratios are exact ppm floor divisions
    of integer day sums. Implied = wip_days div closed; actual =
    Σ(close−open+1) div closed; the two agree in total by the
    conservation identity Σ_m wip(m) ≡ Σ_orders cycle (asserted in
    the naive twin). Scale shape: one lineitem partial-agg scan, one
    |orders|-sized join, a ≤4×|orders| explode, two month-sized aggs.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's operations family.
    """
    return little_law_report(
        cycle_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        )
    )


def cycle_state(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The per-order flow state (o_orderkey, open_date, close_date):
    open is static (the order date), close is a per-key MAX-ship
    monoid — late lines can only extend it, so out-of-order batches
    merge by MAX (the stream_fulfillment convention, flipped). Close
    is clamped to ≥ open (the synthetic data ships some lines before
    the order date; an order is in progress at least its order day) —
    the clamp commutes with MAX, so the state stays a monoid."""
    closes = lineitem.groupBy("l_orderkey").agg(
        F.expr("max(cast(l_shipdate as date))").alias("max_ship")
    )
    return closes.join(
        orders.selectExpr(
            "o_orderkey", "cast(o_orderdate as date) AS open_date"
        ),
        closes["l_orderkey"] == F.col("o_orderkey"),
    ).selectExpr(
        "o_orderkey",
        "open_date",
        "greatest(max_ship, open_date) AS close_date",
    )


def little_law_report(state: DataFrame) -> DataFrame:
    """Close the Little's-law panel over any (o_orderkey, open_date,
    close_date) flow state."""
    spine = state.select(
        "open_date",
        "close_date",
        F.expr(
            "explode(sequence(trunc(open_date, 'MM'),"
            " trunc(close_date, 'MM'), interval 1 month))"
        ).alias("mstart"),
    )
    wip = spine.groupBy(
        F.expr("year(mstart) * 100 + month(mstart)").alias("ym")
    ).agg(
        F.sum(
            F.expr(
                "datediff(least(close_date, last_day(mstart)),"
                " greatest(open_date, mstart)) + 1"
            )
        ).alias("wip_days"),
        F.max(F.expr("day(last_day(mstart))")).alias("dim"),
    )
    closes = state.groupBy(
        F.expr("year(close_date) * 100 + month(close_date)").alias("ym")
    ).agg(
        F.count(F.lit(1)).alias("n_closed"),
        F.sum(
            F.expr("datediff(close_date, open_date) + 1")
        ).alias("cycle_days"),
    )
    return (
        wip.join(closes, "ym", "left")
        .selectExpr(
            "ym",
            "wip_days",
            "coalesce(n_closed, 0) AS n_closed",
            "wip_days * 1000000 div dim AS avg_wip_ppm",
            "wip_days * 1000000 div greatest(coalesce(n_closed, 0), 1)"
            " AS implied_cycle_ppm",
            "coalesce(cycle_days, 0) * 1000000"
            " div greatest(coalesce(n_closed, 0), 1) AS actual_cycle_ppm",
        )
        .orderBy("ym")
    )


ORACLE["q_little_law"] = """
  WITH per AS (
    SELECT l.l_orderkey AS o_orderkey,
           CAST(o.o_orderdate AS DATE) AS open_date,
           greatest(CAST(MAX(l.l_shipdate) AS DATE),
                    CAST(o.o_orderdate AS DATE)) AS close_date
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
  ),
  sp AS (
    SELECT open_date, close_date,
           CAST(unnest(generate_series(date_trunc('month', open_date),
                date_trunc('month', close_date), INTERVAL 1 MONTH))
                AS DATE) AS mstart
    FROM per
  ),
  wip AS (
    SELECT year(mstart) * 100 + month(mstart) AS ym,
           SUM(datediff('day', greatest(open_date, mstart),
               least(close_date, last_day(mstart))) + 1) AS wip_days,
           MAX(day(last_day(mstart))) AS dim
    FROM sp GROUP BY 1
  ),
  closes AS (
    SELECT year(close_date) * 100 + month(close_date) AS ym,
           CAST(COUNT(*) AS BIGINT) AS n_closed,
           SUM(datediff('day', open_date, close_date) + 1) AS cycle_days
    FROM per GROUP BY 1
  )
  SELECT CAST(w.ym AS BIGINT) AS ym,
         CAST(w.wip_days AS BIGINT) AS wip_days,
         CAST(COALESCE(c.n_closed, 0) AS BIGINT) AS n_closed,
         CAST(w.wip_days * 1000000 // w.dim AS BIGINT) AS avg_wip_ppm,
         CAST(w.wip_days * 1000000
              // GREATEST(COALESCE(c.n_closed, 0), 1) AS BIGINT)
           AS implied_cycle_ppm,
         CAST(COALESCE(c.cycle_days, 0) * 1000000
              // GREATEST(COALESCE(c.n_closed, 0), 1) AS BIGINT)
           AS actual_cycle_ppm
  FROM wip w LEFT JOIN closes c ON w.ym = c.ym
  ORDER BY ym
"""


# -- supplier lead-time scorecard ---------------------------------------------------


def q_supplier_leadtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier lead-time scorecard: per supplier, the exact median
    and p95 of line-level lead time (ship − order days, clamped ≥ 0)
    plus the return rate — the vendor-review panel next to
    q_fulfillment_lag (which profiles ORDER-level first-ship lag by
    priority; this profiles LINE-level lead time by SUPPLIER, the
    axis a procurement review ranks on).

    Scale shape — the two-pass exact-quantile device: the data-sized
    work is ONE |lineitem| join to orders + ONE groupBy down to the
    (supplier, lag_days) GRID (lag is calendar-bounded, so the grid
    is |suppliers|·|lags|, independent of line volume); the quantile
    selection then runs as a bounded per-supplier running sum over
    the grid — never a per-supplier sort of raw lines, so a 100×
    supplier's partition never grows. Medians/p95 are pure order
    statistics (smallest lag with cum ≥ ⌈n/2⌉ / ⌈19n/20⌉, ceilings in
    integers); the return rate is ONE exact ppm floor division.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's operations family.
    """
    return leadtime_report(
        leadtime_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        )
    )


def leadtime_state(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The (suppkey, lag_days) grid state: line counts + return counts
    per cell — both plain-sum monoids (late chunks add in), bounded by
    |suppliers|·|calendar lags| regardless of line volume."""
    j = lineitem.join(
        orders.selectExpr("o_orderkey", "o_orderdate"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
    )
    return j.groupBy(
        "l_suppkey",
        F.expr(
            "greatest(datediff(cast(l_shipdate as date),"
            " cast(o_orderdate as date)), 0)"
        ).alias("lag"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr("case when l_returnflag = 'R' then 1 else 0 end")
        ).alias("nr"),
    )


def leadtime_report(grid: DataFrame) -> DataFrame:
    """Close the scorecard over any (l_suppkey, lag, n, nr) grid."""
    w = W.partitionBy("l_suppkey").orderBy("lag")
    w_all = W.partitionBy("l_suppkey")
    cum = grid.select(
        "l_suppkey",
        "lag",
        F.sum("n").over(w).alias("cum"),
        F.sum("n").over(w_all).alias("tot"),
        F.sum("nr").over(w_all).alias("totr"),
    )
    med = (
        cum.filter("cum * 2 >= tot")
        .groupBy("l_suppkey")
        .agg(
            F.min("lag").alias("median_lag"),
            F.max("tot").alias("n_lines"),
            F.max("totr").alias("n_returned"),
        )
    )
    p95 = (
        cum.filter("cum * 20 >= tot * 19")
        .groupBy("l_suppkey")
        .agg(F.min("lag").alias("p95_lag"))
    )
    return (
        med.join(p95, "l_suppkey")
        .selectExpr(
            "l_suppkey",
            "n_lines",
            "median_lag",
            "p95_lag",
            "n_returned * 1000000 div n_lines AS return_ppm",
        )
        .orderBy("l_suppkey")
    )


ORACLE["q_supplier_leadtime"] = """
  WITH grid AS (
    SELECT l_suppkey,
           greatest(datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)), 0) AS lag,
           CAST(COUNT(*) AS BIGINT) AS n,
           SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS nr
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1, 2
  ),
  cum AS (
    SELECT l_suppkey, lag,
           SUM(n) OVER (PARTITION BY l_suppkey ORDER BY lag) AS cum,
           SUM(n) OVER (PARTITION BY l_suppkey) AS tot,
           SUM(nr) OVER (PARTITION BY l_suppkey) AS totr
    FROM grid
  ),
  med AS (
    SELECT l_suppkey, MIN(lag) AS median_lag, MAX(tot) AS n_lines,
           MAX(totr) AS n_returned
    FROM cum WHERE cum * 2 >= tot GROUP BY 1
  ),
  p95 AS (
    SELECT l_suppkey, MIN(lag) AS p95_lag
    FROM cum WHERE cum * 20 >= tot * 19 GROUP BY 1
  )
  SELECT m.l_suppkey,
         CAST(m.n_lines AS BIGINT) AS n_lines,
         CAST(m.median_lag AS BIGINT) AS median_lag,
         CAST(p.p95_lag AS BIGINT) AS p95_lag,
         CAST(m.n_returned * 1000000 // m.n_lines AS BIGINT)
           AS return_ppm
  FROM med m JOIN p95 p ON m.l_suppkey = p.l_suppkey
  ORDER BY m.l_suppkey
"""


# -- ship-SLA attainment panel -------------------------------------------------------

SLA_DAYS = 90  # the q12_late_lines lateness convention


def sla_state(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """The (ship-month, order-priority) SLA grid: line count, on-time
    count (shipped within {SLA_DAYS} days of order — the
    q12_late_lines convention), total days late beyond the SLA, and
    exact revenue cents per cell — all plain-sum monoids
    (late/re-delivered chunks add in), bounded by |months|·|priorities|
    regardless of line volume. ONE |lineitem| join + ONE
    partial-aggregated groupBy. Shared by ``q_ship_sla`` (attainment
    panel), ``stats.q_friedman`` (priority-effect test), and
    ``streaming.stateful.stream_sla``."""
    j = lineitem.join(
        orders.selectExpr("o_orderkey", "o_orderdate", "o_orderpriority"),
        lineitem["l_orderkey"] == F.col("o_orderkey"),
    )
    return j.groupBy(
        F.expr("year(l_shipdate) * 100 + month(l_shipdate)").alias("ym"),
        F.col("o_orderpriority").alias("prio"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr(
                "cast(datediff(cast(l_shipdate as date),"
                f" cast(o_orderdate as date)) <= {SLA_DAYS} as int)"
            )
        ).alias("n_ontime"),
        F.sum(
            F.expr(
                "greatest(datediff(cast(l_shipdate as date),"
                f" cast(o_orderdate as date)) - {SLA_DAYS}, 0)"
            )
        ).alias("late_days"),
        F.sum(
            F.expr(f"cast(floor(l_extendedprice * {SCALE} + 0.5) as bigint)")
        ).alias("rev_c"),
    )


def q_ship_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ship-SLA attainment panel: per ship month and order priority,
    the {SLA_DAYS}-day on-time rate and the mean days-late-beyond-SLA
    among late lines — the delivery-performance TREND a logistics
    review reads next to q12_late_lines (which buckets one flag count
    by priority; this tracks the rate per month so degradation is
    visible when it starts, the axis an SLA renegotiation ranks on).

    Scale shape: all data-sized work is ONE |lineitem| join + the
    partial-aggregated groupBy of ``sla_state`` down to the
    |months|·|priorities| grid (every measure a plain-sum monoid — the
    same state stream_sla maintains live); rates close as exact ppm
    floor divisions over the bounded grid.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine\'s operations family.
    """
    return sla_report(
        sla_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        )
    )


def sla_report(state: DataFrame) -> DataFrame:
    """Close the SLA panel over any (ym, prio, n, n_ontime, late_days,
    rev_c) grid."""
    return state.selectExpr(
        "ym",
        "prio",
        "n AS n_lines",
        "n_ontime * 1000000 div n AS ontime_ppm",
        "late_days * 1000000 div greatest(n - n_ontime, 1)"
        " AS late_days_ppm",
    ).orderBy("ym", "prio")


ORACLE["q_ship_sla"] = f"""
  SELECT year(CAST(l_shipdate AS DATE)) * 100
           + month(CAST(l_shipdate AS DATE)) AS ym,
         o_orderpriority AS prio,
         COUNT(*) AS n_lines,
         CAST(SUM(CAST(datediff(\'day\', CAST(o_orderdate AS DATE),
                                CAST(l_shipdate AS DATE))
                       <= {SLA_DAYS} AS INT))
              * 1000000 // COUNT(*) AS BIGINT) AS ontime_ppm,
         CAST(SUM(GREATEST(datediff(\'day\', CAST(o_orderdate AS DATE),
                                    CAST(l_shipdate AS DATE))
                           - {SLA_DAYS}, 0)) * 1000000
              // GREATEST(COUNT(*)
                 - SUM(CAST(datediff(\'day\', CAST(o_orderdate AS DATE),
                                     CAST(l_shipdate AS DATE))
                            <= {SLA_DAYS} AS INT)), 1)
              AS BIGINT) AS late_days_ppm
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
  ORDER BY 1, 2
"""


# -- price-dispersion discipline panel -----------------------------------------------

PD_BAND = 100_000  # ppm of CV² per band
PD_TOP = 10        # open-ended top band


def q_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-dispersion discipline panel: per brand, how many parts
    sell at consistent prices vs all over the map — each part's
    squared coefficient of variation of sale price (CV² = var/mean²,
    population form) banded into {PD_BAND}-ppm bins (top bin
    open-ended at {PD_TOP}) — the pricing-governance read next to
    q_price_index (which tracks the LEVEL over time; this flags
    within-part INCONSISTENCY a discounting audit chases).

    Scale shape: the ONE data-sized pass aggregates lineitem straight
    to per-part power sums (n, Σx, Σx² — exact cents, Σx² widened
    through DECIMAL(38)/HUGEINT); the brand dimension joins the
    |parts|-sized aggregate, never the fact table (aggregate-then-
    join-dim — at 100 TB the join input is 5 orders of magnitude
    smaller than lineitem). CV² = (n·Σx² − (Σx)²)·10⁶ div (Σx)² is
    ONE exact ppm floor division (denominator > 0: prices are
    positive); single-line parts are excluded (no dispersion is
    measurable), documented on both engines.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's pricing family.
    """
    return dispersion_report(
        dispersion_state(load_table(spark, sf_dir, "lineitem")),
        load_table(spark, sf_dir, "part"),
    )


def dispersion_state(lineitem: DataFrame) -> DataFrame:
    """The per-part price power-sum state ``(l_partkey, n, s, s2)`` —
    every column a plain-sum monoid (Σx² widened DECIMAL(38)), so any
    batching/arrival order reproduces the batch sums; |parts| rows
    forever. Shared by ``q_price_dispersion`` and
    ``streaming.stateful.stream_dispersion``."""
    return lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.expr(f"cast(floor(l_extendedprice * {SCALE} + 0.5) as bigint)")
        ).alias("s"),
        F.sum(
            F.expr(
                f"cast(cast(floor(l_extendedprice * {SCALE} + 0.5)"
                " as decimal(38,0))"
                f" * cast(floor(l_extendedprice * {SCALE} + 0.5) as bigint)"
                " as decimal(38,0))"
            )
        ).alias("s2"),
    )


def dispersion_report(per_part: DataFrame, part: DataFrame) -> DataFrame:
    """Close the banded panel over any (l_partkey, n, s, s2) power-sum
    state plus the static part dim."""
    p = part
    banded = per_part.filter("n >= 2").selectExpr(
        "l_partkey",
        f"least((n * s2 - cast(s as decimal(38,0)) * s) * 1000000"
        f" div (cast(s as decimal(38,0)) * s), {PD_TOP * PD_BAND})"
        " AS cv2_ppm",
    ).selectExpr(
        "l_partkey",
        "cv2_ppm",
        f"least(cv2_ppm div {PD_BAND}, {PD_TOP}) AS band",
    )
    return (
        banded.join(
            p.selectExpr("p_partkey", "p_brand"),
            banded["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand", "band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cv2_ppm").alias("sum_cv2"),
        )
        .selectExpr(
            "p_brand",
            "band",
            "n_parts",
            "sum_cv2 div n_parts AS avg_cv2_ppm",
        )
        .orderBy("p_brand", "band")
    )


ORACLE["q_price_dispersion"] = f"""
  WITH per_part AS (
    SELECT l_partkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * {SCALE} + 0.5)
                         AS BIGINT)) AS HUGEINT) AS s,
           SUM(CAST(FLOOR(l_extendedprice * {SCALE} + 0.5) AS HUGEINT)
               * CAST(FLOOR(l_extendedprice * {SCALE} + 0.5) AS BIGINT))
             AS s2
    FROM lineitem GROUP BY 1
  ),
  banded AS (
    SELECT l_partkey,
           LEAST((n * s2 - s * s) * 1000000 // (s * s),
                 {PD_TOP * PD_BAND}) AS cv2_ppm
    FROM per_part WHERE n >= 2
  ),
  cells AS (
    SELECT p_brand,
           LEAST(cv2_ppm // {PD_BAND}, {PD_TOP}) AS band,
           cv2_ppm
    FROM banded JOIN part ON l_partkey = p_partkey
  )
  SELECT p_brand, CAST(band AS BIGINT) AS band,
         COUNT(*) AS n_parts,
         CAST(SUM(cv2_ppm) // COUNT(*) AS BIGINT) AS avg_cv2_ppm
  FROM cells GROUP BY 1, 2 ORDER BY 1, 2
"""


# -- loyalty-tier migration matrix ---------------------------------------------------

LOY_Y1, LOY_Y2 = 1997, 1998
# Deterministic frequency tiers (orders in the year) — rule-based, not
# quantile-based, so the per-customer year rows stay plain additive
# monoids and the tier is a row-local CASE at close time.
_LOY_TIER = (
    "CASE WHEN {n} = 0 THEN 'none' WHEN {n} = 1 THEN 'one-time'"
    " WHEN {n} <= 3 THEN 'repeat' ELSE 'loyal' END"
)


def q_loyalty_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loyalty-tier migration matrix {LOY_Y1} → {LOY_Y2}: every
    customer active in either year classified by order frequency
    (none / one-time / repeat / loyal) in EACH year, with the exact
    revenue carried by every (from, to) cell — the customer-base flow
    read (who upgraded, who lapsed, what revenue moved with them)
    that q_new_vs_returning's binary split and q_growth_accounting's
    weekly flows both coarsen away.

    Exactness & streaming: the state is the per-customer (n1, rev1_c,
    n2, rev2_c) year pair — ALL four columns plain-sum monoids keyed
    by customer (``stream_loyalty`` maintains it live); tiers are
    row-local CASE rules over the merged counts (rule-based, NOT
    quantile-based, precisely so late chunks can keep adding), the
    matrix is a ≤16-row bounded groupBy, and cell shares close as
    exact ppm floor divisions off a 1-row broadcast total.

    Scale shape: ONE filtered scan of orders, ONE partial-aggregated
    groupBy to |active customers| rows, ONE bounded matrix aggregate.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's customer-analytics family
    (q_rfm_segmentation / q_new_vs_returning / q_mcnemar).
    """
    return loyalty_report(
        loyalty_state(load_table(spark, sf_dir, "orders"))
    )


def loyalty_state(orders: DataFrame) -> DataFrame:
    """The per-customer (n1, rev1_c, n2, rev2_c) two-year activity
    pair — plain-sum monoids keyed by customer."""
    return (
        orders.filter(
            F.expr(f"year(o_orderdate) IN ({LOY_Y1}, {LOY_Y2})")
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.expr(f"cast(year(o_orderdate) = {LOY_Y1} as bigint)")
            ).alias("n1"),
            F.sum(
                F.expr(
                    f"cast(case when year(o_orderdate) = {LOY_Y1}"
                    f" then floor(o_totalprice * {SCALE} + 0.5)"
                    " else 0 end as bigint)"
                )
            ).alias("rev1_c"),
            F.sum(
                F.expr(f"cast(year(o_orderdate) = {LOY_Y2} as bigint)")
            ).alias("n2"),
            F.sum(
                F.expr(
                    f"cast(case when year(o_orderdate) = {LOY_Y2}"
                    f" then floor(o_totalprice * {SCALE} + 0.5)"
                    " else 0 end as bigint)"
                )
            ).alias("rev2_c"),
        )
    )


def loyalty_report(state: DataFrame) -> DataFrame:
    """Close the migration matrix over any per-customer year pair.
    The ≤16-row cell matrix feeds both the total and the output —
    persist it so the data-sized customer aggregate runs ONCE."""
    from locopy_spark.functions.cache import managed_persist

    cells = managed_persist(
        state.select(
            F.expr(_LOY_TIER.format(n="n1")).alias("tier_from"),
            F.expr(_LOY_TIER.format(n="n2")).alias("tier_to"),
            "rev1_c",
            "rev2_c",
        )
        .groupBy("tier_from", "tier_to")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("rev1_c").alias("rev_from_c"),
            F.sum("rev2_c").alias("rev_to_c"),
        ),
        "loyalty",
    )
    tot = cells.agg(F.sum("n_customers").alias("n_total"))
    return (
        cells.crossJoin(F.broadcast(tot))
        .selectExpr(
            "tier_from",
            "tier_to",
            "n_customers",
            "rev_from_c",
            "rev_to_c",
            "cast(cast(n_customers as decimal(38,0)) * 1000000"
            " div n_total as bigint) AS share_ppm",
        )
        .orderBy("tier_from", "tier_to")
    )


ORACLE["q_loyalty_migration"] = f"""
  WITH state AS (
    SELECT o_custkey,
           CAST(SUM(CAST(year(CAST(o_orderdate AS DATE)) = {LOY_Y1}
                    AS BIGINT)) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = {LOY_Y1}
                    THEN CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS rev1_c,
           CAST(SUM(CAST(year(CAST(o_orderdate AS DATE)) = {LOY_Y2}
                    AS BIGINT)) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = {LOY_Y2}
                    THEN CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS rev2_c
    FROM orders
    WHERE year(CAST(o_orderdate AS DATE)) IN ({LOY_Y1}, {LOY_Y2})
    GROUP BY o_custkey
  ),
  cells AS (
    SELECT CASE WHEN n1 = 0 THEN 'none' WHEN n1 = 1 THEN 'one-time'
                WHEN n1 <= 3 THEN 'repeat' ELSE 'loyal' END AS tier_from,
           CASE WHEN n2 = 0 THEN 'none' WHEN n2 = 1 THEN 'one-time'
                WHEN n2 <= 3 THEN 'repeat' ELSE 'loyal' END AS tier_to,
           COUNT(*) AS n_customers,
           CAST(SUM(rev1_c) AS BIGINT) AS rev_from_c,
           CAST(SUM(rev2_c) AS BIGINT) AS rev_to_c
    FROM state GROUP BY 1, 2
  ),
  tot AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS n_total FROM cells)
  SELECT tier_from, tier_to, CAST(n_customers AS BIGINT) AS n_customers,
         rev_from_c, rev_to_c,
         CAST(CAST(n_customers AS HUGEINT) * 1000000 // n_total AS BIGINT)
           AS share_ppm
  FROM cells, tot ORDER BY tier_from, tier_to
"""
