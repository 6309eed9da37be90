"""Association / concentration / survival statistics.

The locopy reference (locopy/database.py:131 ``execute``) hands these
exact analyst SQL shapes to the warehouse; here Spark IS the
warehouse, so each is a Catalyst plan with a DuckDB oracle twin.

Family: Mann–Kendall trend test (the nonparametric complement to
q_ols_trend), Kendall tau-b (rank association robust where Spearman's
centered ranks saturate), Cramér's V (categorical association),
Herfindahl–Hirschman concentration (the market-power index next to
q_gini), Kaplan–Meier survival (customer-lifetime churn curve), and
Kruskal–Wallis (the k-group extension of q_mann_whitney).

Exactness conventions (SURVEY §4): every statistic closes from exact
scaled integers; products widen through Spark DECIMAL(38,0) / DuckDB
HUGEINT; floor division is Spark ``div`` / DuckDB ``//`` (positive
operands → identical truncation); the one final double expression is
byte-identical on both engines; double sums over group sets are
replaced by fixed-order pivoted term chains (partition-order-proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from locopy_spark.functions.cache import managed_persist
from locopy_spark.functions.numeric import SCALE
from locopy_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}


# -- Mann–Kendall trend test -------------------------------------------------

# z with the standard continuity correction; s_stat/var18 are exact
# bigints so the single double expression is engine-identical
_MK_Z = (
    "CASE WHEN s_stat > 0 THEN"
    " (CAST(s_stat AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
    " WHEN s_stat < 0 THEN"
    " (CAST(s_stat AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0)"
    " ELSE 0.0 END"
)
# two-sided α=0.05 normal critical value, exact decimal literal
_MK_CRIT = "1.959964"


def _mk_tie_term(wide: str) -> str:
    return f"CAST(SUM(CAST(t AS {wide}) * (t - 1) * (2 * t + 5)) AS BIGINT)"


def _mk_var18(wide: str) -> str:
    return (
        f"CAST(CAST(n_days AS {wide}) * (n_days - 1) * (2 * n_days + 5)"
        " - tie_term AS BIGINT)"
    )


def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test on daily order revenue — the
    distribution-free "is revenue drifting" answer that q_ols_trend's
    least-squares slope can't give when the series is non-normal.

    Everything runs on the |days|-sized daily aggregate (whole
    currency units, the ``q_anomaly_days`` convention — bounded by the
    calendar, not data volume), so the O(|days|²) sign-pair join is
    constant work at any SF: the aggregate broadcasts and the
    inequality join is a broadcast nested loop over ~3M comparisons,
    never a shuffle (the ``q_theil_sen`` bounded-pair precedent).
    S = Σ sgn(x_j − x_i) and the tie-corrected Var·18 are exact
    bigints; z closes with the standard continuity correction as one
    shared double expression.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(F.expr("cast(floor(o_totalprice + 0.5) as bigint)")).alias("x")
    )
    return mk_over_daily(daily)


def mk_over_daily(daily: DataFrame) -> DataFrame:
    """The Mann–Kendall scorer over any ``(day, x)`` daily series —
    shared with the streaming state view (the ``acf_over_daily``
    pattern) so stream-vs-batch tests exercise series maintenance,
    not two scorer copies."""
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(F.broadcast(b), F.expr("a.day < b.day"))
        .select(F.expr("cast(sign(b.x - a.x) as bigint)").alias("sgn"))
        .agg(F.coalesce(F.sum("sgn"), F.lit(0)).alias("s_stat"))
    )
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.sum("t").alias("n_days"),
            F.expr(_mk_tie_term("DECIMAL(38,0)")).alias("tie_term"),
        )
    )
    row = (
        s.crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            F.expr(_mk_var18("DECIMAL(38,0)")).alias("var18"),
        )
        .select("n_days", "s_stat", "var18", F.expr(_MK_Z).alias("z"))
    )
    return row.select(
        "n_days",
        "s_stat",
        "var18",
        "z",
        F.expr(
            f"CASE WHEN z > {_MK_CRIT} THEN 'increasing'"
            f" WHEN z < -{_MK_CRIT} THEN 'decreasing'"
            " ELSE 'no trend' END"
        ).alias("trend"),
    )


ORACLE["q_mann_kendall"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders GROUP BY 1
  ),
  s AS (
    SELECT CAST(COALESCE(SUM(CAST(SIGN(b.x - a.x) AS BIGINT)), 0)
                AS BIGINT) AS s_stat
    FROM daily a JOIN daily b ON a.day < b.day
  ),
  ties AS (
    SELECT CAST(SUM(t) AS BIGINT) AS n_days,
           {_mk_tie_term("HUGEINT")} AS tie_term
    FROM (SELECT COUNT(*) AS t FROM daily GROUP BY x)
  ),
  v AS (
    SELECT n_days, s_stat, {_mk_var18("HUGEINT")} AS var18
    FROM s, ties
  ),
  z AS (SELECT n_days, s_stat, var18, {_MK_Z} AS z FROM v)
  SELECT n_days, s_stat, var18, z,
         CASE WHEN z > {_MK_CRIT} THEN 'increasing'
              WHEN z < -{_MK_CRIT} THEN 'decreasing'
              ELSE 'no trend' END AS trend
  FROM z
"""


# -- Kendall tau-b -----------------------------------------------------------

# tau_b = (C − D) / (sqrt((n(n−1) − Σtx(tx−1))/2) · sqrt(... ty ...));
# every operand is an exact bigint < 2^53 at gate SFs, the doubled tie
# sums avoid /2 until inside the sqrt
# An ALL-tied variable (possible mid-stream: constant column) zeroes
# its tie-adjusted pair count — NULL, not an ANSI divide crash.
_TAU_B = (
    "CASE WHEN n <= 1"
    " OR CAST(n1x2 AS DOUBLE) = CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
    " OR CAST(n1y2 AS DOUBLE) = CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
    " THEN CAST(NULL AS DOUBLE) ELSE"
    " CAST(concordant - discordant AS DOUBLE)"
    " / (sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
    " - CAST(n1x2 AS DOUBLE)) / 2.0)"
    " * sqrt((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)"
    " - CAST(n1y2 AS DOUBLE)) / 2.0)) END"
)


def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall tau-b between order value and order width (line
    count) — the concordance complement to ``q_spearman``: counts pair
    agreements instead of correlating ranks, so a few extreme ranks
    can't dominate.

    The O(n²) pair space is never touched: concordant/discordant
    counts come from a 2-D prefix-sum device over the |Vx|×|Vy| value
    GRID (|Vy| = distinct line counts ≤ ~7, so the grid is a small
    multiple of the distinct-price count — metadata, not data).
    For each grid point, s_gt(x,y) = #points(x' > x, y-val = y) falls
    out of one range-partitioned grouped running sum
    (operators.ranking.grouped_global_running_sum — no one-partition
    window); the within-x suffix/prefix over y (a ≤|Vy|-row window per
    x, embarrassingly parallel) then gives G/L = #points strictly
    greater/less in both axes, and C = Σ n_cell·G, D = Σ n_cell·L as
    exact bigints through DECIMAL(38)/HUGEINT. tau-b closes as one
    shared double expression over five exact integers.
    """
    from locopy_spark.operators.ranking import grouped_global_running_sum

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).alias("y")
    )
    base = (
        o.select(
            "o_orderkey",
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
                "x"
            ),
        )
        .join(cnt, "o_orderkey")
        .select("x", "y")
    )
    cells = base.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n"))
    # the grid is PERSISTED (r11): the running-sum device range-
    # partitions it, and the range partitioner's boundary-sampling
    # pass is a separate JOB that would otherwise recompute the whole
    # join->cells->crossjoin subtree before the shuffle reads it again
    # (interleaved A/B at sf0.1: 4.8 -> 3.0 s min-of-3).  A cells-
    # level persist was tried earlier in r11 and lost to in-plan
    # exchange reuse; the cross-job sampler re-read is the one with no
    # exchange to reuse.  A device-internal blanket persist was also
    # A/B'd and rejected (cheap inputs lose) — see ranking._ranged.
    from locopy_spark.functions.cache import managed_persist

    grid = managed_persist(
        cells.select("x")
        .distinct()
        .crossJoin(F.broadcast(cells.select("y").distinct()))
        .join(cells, ["x", "y"], "left")
        .select("x", "y", F.coalesce(F.col("n"), F.lit(0)).alias("n")),
        "kendall_tau",
    )
    g = grouped_global_running_sum(
        grid,
        group_cols=["y"],
        order_cols=["x"],
        weight_col="n",
        out_col="cle",
        total_col="toty",
    ).withColumn("sgt", F.expr("toty - cle"))
    wx = Window.partitionBy("x").orderBy("y")
    gl = g.select(
        "x",
        "y",
        "n",
        F.coalesce(
            F.sum("sgt").over(wx.rowsBetween(1, Window.unboundedFollowing)),
            F.lit(0),
        ).alias("gt"),
        F.coalesce(
            F.sum("sgt").over(wx.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("lt"),
    )
    # no cells⋈gl join (r11): the cell count n rides THROUGH the
    # prefix-sum device, and zero-filled grid points contribute 0·gt =
    # 0 to both sums — identical bigints to the joined form, minus a
    # |grid|-sized shuffle join
    cd = gl.agg(
        F.expr(
            "CAST(SUM(CAST(n AS DECIMAL(38,0)) * gt) AS BIGINT)"
        ).alias("concordant"),
        F.expr(
            "CAST(SUM(CAST(n AS DECIMAL(38,0)) * lt) AS BIGINT)"
        ).alias("discordant"),
    )
    # tie terms fold out of the cell aggregate (r11): Σ_y n per x IS
    # the per-x row count — identical bigints to the pre-r11 form,
    # which re-counted base (replaying the orders⋈lineitem join twice)
    tx = (
        cells.groupBy("x")
        .agg(F.sum("n").alias("t"))
        .agg(
            F.sum("t").alias("n"),
            F.expr(
                "CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS BIGINT)"
            ).alias("n1x2"),
        )
    )
    ty = (
        cells.groupBy("y")
        .agg(F.sum("n").alias("t"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(t AS DECIMAL(38,0)) * (t - 1)) AS BIGINT)"
            ).alias("n1y2")
        )
    )
    return (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .select(
            "n", "concordant", "discordant", F.expr(_TAU_B).alias("tau_b")
        )
    )


ORACLE["q_kendall_tau"] = f"""
  WITH base AS (
    SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x, y
    FROM orders
    JOIN (SELECT l_orderkey AS o_orderkey, COUNT(*) AS y
          FROM lineitem GROUP BY 1) USING (o_orderkey)
  ),
  cells AS (SELECT x, y, COUNT(*) AS n FROM base GROUP BY 1, 2),
  grid AS (
    SELECT xs.x, ys.y, COALESCE(c.n, 0) AS n
    FROM (SELECT DISTINCT x FROM cells) xs
    CROSS JOIN (SELECT DISTINCT y FROM cells) ys
    LEFT JOIN cells c USING (x, y)
  ),
  cum AS (
    SELECT x, y,
           SUM(n) OVER (PARTITION BY y ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle,
           SUM(n) OVER (PARTITION BY y) AS toty
    FROM grid
  ),
  sg AS (SELECT x, y, toty - cle AS sgt FROM cum),
  gl AS (
    SELECT x, y,
           COALESCE(SUM(sgt) OVER (PARTITION BY x ORDER BY y
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS gt,
           COALESCE(SUM(sgt) OVER (PARTITION BY x ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lt
    FROM sg
  ),
  cd AS (
    SELECT CAST(SUM(CAST(n AS HUGEINT) * gt) AS BIGINT) AS concordant,
           CAST(SUM(CAST(n AS HUGEINT) * lt) AS BIGINT) AS discordant
    FROM cells JOIN gl USING (x, y)
  ),
  tx AS (
    SELECT CAST(SUM(t) AS BIGINT) AS n,
           CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS BIGINT) AS n1x2
    FROM (SELECT COUNT(*) AS t FROM base GROUP BY x)
  ),
  ty AS (
    SELECT CAST(SUM(CAST(t AS HUGEINT) * (t - 1)) AS BIGINT) AS n1y2
    FROM (SELECT COUNT(*) AS t FROM base GROUP BY y)
  )
  SELECT n, concordant, discordant, {_TAU_B} AS tau_b
  FROM cd, tx, ty
"""


# -- Cramér's V --------------------------------------------------------------


def _cv_d(wide: str) -> str:
    """Per-cell common-denominator deviation n·n_ij − r_i·c_j."""
    return f"CAST(n AS {wide}) * n_ij - CAST(r_i AS {wide}) * c_j"


def _cv_term(fd: str, wide: str) -> str:
    """Exact ppb chi² contribution ⌊d²·1e9 / (n·r_i·c_j)⌋ — every
    operand widened so the worst case (~1e30 at sf1) stays inside
    DECIMAL(38)/HUGEINT."""
    return (
        f"CAST(CAST(d * d AS {wide}) * 1000000000"
        f" {fd} (CAST(n AS {wide}) * r_i * c_j) AS BIGINT)"
    )


# A contingency table collapsed to one row or column (constant
# attribute, possible mid-stream) has zero degrees of freedom — NULL,
# not an ANSI divide crash.
_CV_V = (
    "CASE WHEN n = 0 OR least(n_rows, n_cols) <= 1"
    " THEN CAST(NULL AS DOUBLE) ELSE"
    " sqrt((CAST(chi2_ppb AS DOUBLE) / 1.0e9)"
    " / (CAST(n AS DOUBLE) * CAST(least(n_rows, n_cols) - 1 AS DOUBLE)))"
    " END"
)


def contingency_state(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The additive |priorities|×|segments| contingency table —
    per-cell counts merge by (pri, seg), so the streaming twin keeps
    this exact table as bounded state forever."""
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).alias("n_ij"))
    )


def cramers_report(cells: DataFrame) -> DataFrame:
    """Close Cramér's V from the contingency cells: margins are
    |rows|+|cols|-sized broadcasts, chi² is an exact integer in ppb
    (per-cell floor division — deterministic, documented convention),
    V is the one double expression."""
    r = cells.groupBy("pri").agg(F.sum("n_ij").alias("r_i"))
    c = cells.groupBy("seg").agg(F.sum("n_ij").alias("c_j"))
    tot = cells.agg(
        F.sum("n_ij").alias("n"),
        F.countDistinct("pri").alias("n_rows"),
        F.countDistinct("seg").alias("n_cols"),
    )
    j = (
        cells.join(F.broadcast(r), "pri")
        .join(F.broadcast(c), "seg")
        .crossJoin(F.broadcast(tot))
        .withColumn("d", F.expr(_cv_d("DECIMAL(38,0)")))
    )
    agg = j.groupBy("n", "n_rows", "n_cols").agg(
        F.sum(F.expr(_cv_term("div", "DECIMAL(38,0)"))).alias("chi2_ppb")
    )
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        F.expr("(n_rows - 1) * (n_cols - 1)").alias("dof"),
        "chi2_ppb",
        F.expr(_CV_V).alias("cramers_v"),
    )


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between order priority and customer
    market segment — the categorical-association check run before
    treating two dimensions as independent strata (near 0 on TPC-H's
    independent columns; the oracle verifies the exact chi² integer,
    not just the headline V).

    Scale shape: one broadcast dim join + one |R|×|C|-cell aggregate
    (map-side combined); everything after runs on ≤25 rows. The cell
    table is the additive state the streaming twin maintains.
    """
    return cramers_report(
        contingency_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )
    )


ORACLE["q_cramers_v"] = f"""
  WITH cells AS (
    SELECT o_orderpriority AS pri, c_mktsegment AS seg,
           COUNT(*) AS n_ij
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
  ),
  r AS (SELECT pri, CAST(SUM(n_ij) AS BIGINT) AS r_i FROM cells GROUP BY 1),
  c AS (SELECT seg, CAST(SUM(n_ij) AS BIGINT) AS c_j FROM cells GROUP BY 1),
  tot AS (
    SELECT CAST(SUM(n_ij) AS BIGINT) AS n,
           COUNT(DISTINCT pri) AS n_rows,
           COUNT(DISTINCT seg) AS n_cols
    FROM cells
  ),
  d AS (
    SELECT n, n_rows, n_cols, n_ij, r_i, c_j, {_cv_d("HUGEINT")} AS d
    FROM cells JOIN r USING (pri) JOIN c USING (seg), tot
  ),
  agg AS (
    SELECT n, n_rows, n_cols,
           CAST(SUM({_cv_term("//", "HUGEINT")}) AS BIGINT) AS chi2_ppb
    FROM d GROUP BY 1, 2, 3
  )
  SELECT n, n_rows, n_cols,
         CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS dof,
         chi2_ppb, {_CV_V} AS cramers_v
  FROM agg
"""


# -- Goodman–Kruskal lambda ---------------------------------------------------


def q_goodman_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goodman–Kruskal λ between order priority and customer market
    segment, both prediction directions — the proportional-reduction-
    in-error companion to q_cramers_v (V says "how far from
    independent"; λ says "how much does knowing one column actually
    improve a modal guess of the other", which is the question a
    feature-selection pass asks). Logarithm-free and pure integer:
    λ = (Σ_rows max_cell − max_margin) / (n − max_margin), closed as
    exact ppm floor divisions.

    Scale shape: SHARES ``contingency_state`` with q_cramers_v (the
    streaming twin's one bounded additive state serves both
    finishers); everything after the cell aggregate runs on ≤|R|×|C|
    rows. Degenerate margins (single-category column → denominator 0)
    clamp via greatest(·,1), the q_mix_drift convention.

    Reference parity note: the reference (capitalone/locopy,
    database.py) ships no analytics; this extends the engine's
    categorical-association family.
    """
    return lambda_report(
        contingency_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )
    )


def lambda_report(cells: DataFrame) -> DataFrame:
    """Close both λ directions from the contingency cells in ONE pass:
    a cube over the ≤|R|×|C|-row cell table yields per-row and
    per-column modal maxima AND margins simultaneously (grouping
    indicators tell the levels apart), so the fact table upstream is
    scanned exactly once — no per-margin re-aggregation. Both λs are
    exact ppm floor divisions off the 1-row scalar table."""
    cube = cells.cube("pri", "seg").agg(
        F.max("n_ij").alias("mx"),
        F.sum("n_ij").alias("s"),
        F.grouping("pri").alias("gp"),
        F.grouping("seg").alias("gs"),
    )
    one = cube.agg(
        F.expr("sum(CASE WHEN gp=1 AND gs=1 THEN s END)").alias("n"),
        F.expr("sum(CASE WHEN gp=0 AND gs=1 THEN mx END)").alias(
            "sum_row_max"
        ),
        F.expr("max(CASE WHEN gp=1 AND gs=0 THEN s END)").alias(
            "max_col_marg"
        ),
        F.expr("sum(CASE WHEN gp=1 AND gs=0 THEN mx END)").alias(
            "sum_col_max"
        ),
        F.expr("max(CASE WHEN gp=0 AND gs=1 THEN s END)").alias(
            "max_row_marg"
        ),
    )
    return one.selectExpr(
        "n",
        "sum_row_max",
        "max_col_marg",
        "(sum_row_max - max_col_marg) * 1000000"
        " div greatest(n - max_col_marg, 1) AS lambda_seg_ppm",
        "sum_col_max",
        "max_row_marg",
        "(sum_col_max - max_row_marg) * 1000000"
        " div greatest(n - max_row_marg, 1) AS lambda_pri_ppm",
    )


ORACLE["q_goodman_lambda"] = """
  WITH cells AS (
    SELECT o_orderpriority AS pri, c_mktsegment AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_ij
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
  ),
  rm AS (SELECT pri, MAX(n_ij) AS mx FROM cells GROUP BY 1),
  cm AS (SELECT seg, MAX(n_ij) AS mx FROM cells GROUP BY 1),
  rg AS (SELECT pri, SUM(n_ij) AS r_i FROM cells GROUP BY 1),
  cg AS (SELECT seg, SUM(n_ij) AS c_j FROM cells GROUP BY 1),
  s AS (
    SELECT (SELECT SUM(n_ij) FROM cells) AS n,
           (SELECT SUM(mx) FROM rm) AS sum_row_max,
           (SELECT SUM(mx) FROM cm) AS sum_col_max,
           (SELECT MAX(c_j) FROM cg) AS max_col_marg,
           (SELECT MAX(r_i) FROM rg) AS max_row_marg
  )
  SELECT CAST(n AS BIGINT) AS n,
         CAST(sum_row_max AS BIGINT) AS sum_row_max,
         CAST(max_col_marg AS BIGINT) AS max_col_marg,
         CAST((sum_row_max - max_col_marg) * 1000000
              // GREATEST(n - max_col_marg, 1) AS BIGINT)
           AS lambda_seg_ppm,
         CAST(sum_col_max AS BIGINT) AS sum_col_max,
         CAST(max_row_marg AS BIGINT) AS max_row_marg,
         CAST((sum_col_max - max_row_marg) * 1000000
              // GREATEST(n - max_row_marg, 1) AS BIGINT)
           AS lambda_pri_ppm
  FROM s
"""


# -- Herfindahl–Hirschman concentration --------------------------------------

_HHI_PPM = (
    "CAST((ssq * 1000000) div (CAST(tot AS DECIMAL(38,0)) * tot)"
    " AS BIGINT)"
)
_HHI_PPM_DUCK = (
    "CAST((ssq * 1000000) // (CAST(tot AS HUGEINT) * tot) AS BIGINT)"
)


def hhi_state(lineitem: DataFrame, supplier: DataFrame,
              nation: DataFrame) -> DataFrame:
    """Per-(nation, supplier) revenue cents — the additive state
    (merge by key, |suppliers| rows forever) behind the HHI report."""
    return (
        lineitem.join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            lineitem["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)")
            ).alias("s")
        )
    )


def hhi_report(state: DataFrame) -> DataFrame:
    """Close HHI per nation from the supplier-revenue state: Σs² and
    S² widen through DECIMAL(38)/HUGEINT, HHI is one exact ppm floor
    division, and the effective-firm count 1e6/HHI is the single
    double."""
    agg = state.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("s").alias("tot"),
        F.expr("SUM(CAST(s AS DECIMAL(38,0)) * s)").alias("ssq"),
    )
    return (
        agg.select(
            "n_name",
            "n_suppliers",
            F.expr(_HHI_PPM).alias("hhi_ppm"),
        )
        .select(
            "n_name",
            "n_suppliers",
            "hhi_ppm",
            F.expr("1000000.0 / CAST(hhi_ppm AS DOUBLE)").alias(
                "equiv_firms"
            ),
        )
        .orderBy("n_name")
    )


def q_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman index of supplier-revenue concentration
    within each nation — the market-power screen (ppm scale: >2,500
    ppm×100 is the antitrust "highly concentrated" line) that
    complements q_gini's customer-side inequality.

    Scale shape: one broadcast dim join, one partial-aggregated
    groupBy to the |suppliers|-sized state (the additive table the
    streaming twin maintains), then |nations|-row arithmetic. Exact:
    cents are bigints, Σs²·1e6 and S² stay inside DECIMAL(38)/HUGEINT
    to ~$10T/supplier, HHI is a floor division on positives.
    """
    return hhi_report(
        hhi_state(
            load_table(spark, sf_dir, "lineitem"),
            load_table(spark, sf_dir, "supplier"),
            load_table(spark, sf_dir, "nation"),
        )
    )


ORACLE["q_hhi"] = f"""
  WITH state AS (
    SELECT n_name, l_suppkey AS suppkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS s
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1, 2
  ),
  agg AS (
    SELECT n_name, COUNT(*) AS n_suppliers,
           CAST(SUM(s) AS BIGINT) AS tot,
           SUM(CAST(s AS HUGEINT) * s) AS ssq
    FROM state GROUP BY 1
  ),
  h AS (
    SELECT n_name, n_suppliers, {_HHI_PPM_DUCK} AS hhi_ppm FROM agg
  )
  SELECT n_name, n_suppliers, hhi_ppm,
         1000000.0 / CAST(hhi_ppm AS DOUBLE) AS equiv_firms
  FROM h ORDER BY n_name
"""


# -- Kaplan–Meier survival ---------------------------------------------------

KM_CHURN_DAYS = 90


def span_state(orders: DataFrame) -> DataFrame:
    """The per-customer span state ``(o_custkey, first_d, last_d)`` —
    a (MIN, MAX) monoid per key (merge = min of firsts, max of lasts),
    so a streaming maintainer (``streaming.stateful.stream_survival``)
    reproduces the batch spans on any arrival order; |customers| rows
    forever. Lifetimes/censoring are derived ONLY in the finisher —
    both move as later orders arrive for a customer, so neither would
    be a monoid in-state (the stream_backlog banding lesson)."""
    return orders.groupBy("o_custkey").agg(
        F.min(F.col("o_orderdate").cast("date")).alias("first_d"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
    )


def lifetime_risk_report(span: DataFrame) -> DataFrame:
    """Close the (t, d, c, n_risk) at-risk table over the span state:
    horizon = max last_d, lifetimes + censoring flags, per-t counts,
    and the range-partitioned exclusive prefix sum (no one-partition
    window). Feeds both survival finishers."""
    from locopy_spark.operators.ranking import global_running_sum

    # NO persist (r12 session 2): the session-1 span persist targeted
    # the prefix-sum device's range-sampler re-read, which the bounded
    # window arm below removed; re-A/B'd after that change the persist
    # LOSES (q_kaplan_meier 1.73 -> 1.04 s min, q_nelson_aalen 1.03 ->
    # 0.50 without it) — the remaining mx/per_t double read is cheaper
    # than the cache-materialization barrier.
    mx = span.agg(F.max("last_d").alias("mx"))
    life = span.crossJoin(F.broadcast(mx)).select(
        F.expr("datediff(last_d, first_d)").alias("t"),
        F.expr(
            f"cast(datediff(mx, last_d) > {KM_CHURN_DAYS} as int)"
        ).alias("ev"),
    )
    per_t = life.groupBy("t").agg(
        F.sum("ev").alias("d"),
        F.sum(F.expr("1 - ev")).alias("c"),
        F.count(F.lit(1)).alias("m"),
    )
    # bounded arm (r12): per_t is the lifetime-day grid — <= |calendar
    # days| rows at any volume, so the plain window beats the range
    # device's sampler job.
    cum = global_running_sum(
        per_t, order_cols=["t"], value_col="m", out_col="pre", bounded=True
    )
    tot = per_t.agg(F.sum("m").alias("n_total"))
    return cum.crossJoin(F.broadcast(tot)).select(
        "t", "d", "c", F.expr("n_total - pre").alias("n_risk")
    )


def _lifetime_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared survival scaffolding of q_kaplan_meier and
    q_nelson_aalen: ONE partial-aggregated customer span
    (``span_state``) closed to the at-risk table
    (``lifetime_risk_report``)."""
    return lifetime_risk_report(span_state(load_table(spark, sf_dir, "orders")))


# The matching DuckDB CTE chain ending in idx(t, d, c, n_risk) — shared
# verbatim by both survival oracles so a scaffolding fix cannot miss one.
_SQL_LIFE_RISK = f"""
  WITH span AS (
    SELECT o_custkey,
           MIN(CAST(o_orderdate AS DATE)) AS fd,
           MAX(CAST(o_orderdate AS DATE)) AS ld
    FROM orders GROUP BY 1
  ),
  mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders),
  life AS (
    SELECT datediff('day', fd, ld) AS t,
           CAST(datediff('day', ld, mx) > {KM_CHURN_DAYS} AS INT) AS ev
    FROM span, mx
  ),
  per_t AS (
    SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
           CAST(SUM(1 - ev) AS BIGINT) AS c,
           COUNT(*) AS m
    FROM life GROUP BY 1
  ),
  idx AS (
    SELECT t, d, c,
           ROW_NUMBER() OVER (ORDER BY t) AS i,
           CAST((SELECT SUM(m) FROM per_t) AS BIGINT)
             - CAST(COALESCE(SUM(m) OVER (
                 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS n_risk
    FROM per_t
  )"""


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of customer lifetime (days between
    first and last order): a customer whose last order sits more than
    {KM_CHURN_DAYS} days before the dataset horizon is a churn EVENT
    at t = lifetime; later last-orders are right-CENSORED — the
    estimator that reads retention correctly where a naive churn rate
    can't (censored customers aren't failures).

    Scale shape: per-customer spans are one partial-aggregated
    groupBy; the at-risk counts n_t = N − #(lifetime < t) come from a
    range-partitioned exclusive prefix sum over the |distinct
    lifetimes|-sized aggregate (operators.ranking.global_running_sum);
    the inherently-sequential survival product runs as ONE Arrow task
    over that bounded table (≤ |days| rows — the q_exp_smooth /
    q_holt_linear regime), kept exact in ppb fixed point:
    S_t = ⌊S_{{t-1}}·(n_t − d_t) / n_t⌋ (products ≤ 1e9·N, inside
    bigint to N ~ 9e9 customers). DuckDB twin = the same recurrence as
    a recursive CTE, bit-exact.
    """
    return km_from_risk(_lifetime_risk(spark, sf_dir))


def km_from_risk(risk: DataFrame) -> DataFrame:
    """KM finisher over any (t, d, c, n_risk) at-risk table (batch
    scaffolding or the stream_survival state's report)."""

    def km(pdf):
        pdf = pdf.sort_values("t").reset_index(drop=True)
        s = 10**9
        out = []
        for d, n in zip(pdf["d"].tolist(), pdf["n_risk"].tolist()):
            s = (s * (n - d)) // n
            out.append(s)
        pdf["surv_ppb"] = out
        return pdf

    km_df = (
        risk.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(
            km, "__g int, t int, d long, c long, n_risk long, surv_ppb long"
        )
    )
    return km_df.select(
        "t",
        "n_risk",
        F.col("d").alias("d_events"),
        F.col("c").alias("c_censored"),
        "surv_ppb",
        (F.col("surv_ppb").cast("double") / 1.0e9).alias("survival"),
    ).orderBy("t")


ORACLE["q_kaplan_meier"] = f"""
  {_SQL_LIFE_RISK},
  km(i, t, d, c, n_risk, s) AS (
    SELECT i, t, d, c, n_risk,
           CAST((1000000000 * (n_risk - d)) // n_risk AS BIGINT)
    FROM idx WHERE i = 1
    UNION ALL
    SELECT x.i, x.t, x.d, x.c, x.n_risk,
           CAST((k.s * (x.n_risk - x.d)) // x.n_risk AS BIGINT)
    FROM idx x JOIN km k ON x.i = k.i + 1
  )
  SELECT t, n_risk, d AS d_events, c AS c_censored,
         s AS surv_ppb, CAST(s AS DOUBLE) / 1.0e9 AS survival
  FROM km ORDER BY t
"""
ORACLE["q_kaplan_meier"] = (
    "WITH RECURSIVE" + ORACLE["q_kaplan_meier"].split("WITH", 1)[1]
)


# -- Nelson–Aalen cumulative hazard ------------------------------------------


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve of customer lifetime — the
    additive companion to q_kaplan_meier (same churn-event/censoring
    model): H_t = Σ_{s≤t} d_s/n_s, the estimator of choice when hazard
    INCREMENTS matter (where is churn accelerating?) rather than the
    survival level.

    Exactness: the per-day hazard closes as one floor division in ppb
    (h_t = ⌊d_t·1e9/n_t⌋, exact on both engines), and unlike the KM
    product the cumulative sum is ADDITIVE — no sequential Arrow task
    at all. Scale shape: the shared ``_lifetime_risk`` scaffolding
    (one partial-agg + range-partitioned prefix sum) plus a SECOND
    range-partitioned prefix sum for H — every step is bounded by
    |distinct lifetimes| ≤ days, nothing single-partition.
    """
    return na_from_risk(_lifetime_risk(spark, sf_dir))


def na_from_risk(risk: DataFrame) -> DataFrame:
    """Nelson–Aalen finisher over any (t, d, c, n_risk) at-risk table."""
    from locopy_spark.operators.ranking import global_running_sum

    risk = risk.withColumn(
        "haz_ppb", F.expr("d * 1000000000 div n_risk")
    )
    # bounded arm (r12): the at-risk table is |distinct lifetimes| <=
    # |calendar days| rows at any volume.
    cum = global_running_sum(
        risk, order_cols=["t"], value_col="haz_ppb", out_col="pre_h",
        bounded=True,
    )
    return cum.select(
        "t",
        "n_risk",
        F.col("d").alias("d_events"),
        "haz_ppb",
        F.expr("pre_h + haz_ppb").alias("cumhaz_ppb"),
        F.expr("cast(pre_h + haz_ppb as double) / 1.0e9").alias("cumhaz"),
    ).orderBy("t")


ORACLE["q_nelson_aalen"] = f"""
  {_SQL_LIFE_RISK}
  SELECT t, n_risk, d AS d_events,
         CAST((d * 1000000000) // n_risk AS BIGINT) AS haz_ppb,
         CAST(SUM((d * 1000000000) // n_risk)
              OVER (ORDER BY t) AS BIGINT) AS cumhaz_ppb,
         CAST(CAST(SUM((d * 1000000000) // n_risk)
              OVER (ORDER BY t) AS BIGINT) AS DOUBLE) / 1.0e9 AS cumhaz
  FROM idx ORDER BY t
"""


# -- Kruskal–Wallis ----------------------------------------------------------

KW_SEGMENTS = [
    "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
]


def _kw_h_terms() -> str:
    """Σ_g (R2_g/2)²/n_g as a FIXED-ORDER explicit five-term chain —
    double addition is not associative, so the sum over groups is
    spelled out instead of aggregated (identical text both engines,
    empty groups contribute 0)."""
    terms = []
    for s in KW_SEGMENTS:
        k = s.lower()
        terms.append(
            f"(CASE WHEN n_{k} > 0 THEN"
            f" (CAST(r2_{k} AS DOUBLE) / 2.0) * (CAST(r2_{k} AS DOUBLE) / 2.0)"
            f" / CAST(n_{k} AS DOUBLE) ELSE 0.0 END)"
        )
    return " + ".join(terms)


# Degenerate guards (possible mid-stream, never on the gated tables):
# n = 0 has no ranks, and an ALL-tied pooled sample saturates the tie
# correction (T = n³ − n), zeroing its denominator — NULL, not an
# ANSI divide-by-zero crash (shared text, so both engines agree).
_KW_H = (
    "CASE WHEN n <= 0 THEN CAST(NULL AS DOUBLE) ELSE"
    f" 12.0 * ({_kw_h_terms()})"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))"
    " - 3.0 * (CAST(n AS DOUBLE) + 1.0) END"
)
_KW_HC = (
    "CASE WHEN h IS NULL OR CAST(ties_t AS DOUBLE)"
    " = CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    " - CAST(n AS DOUBLE) THEN CAST(NULL AS DOUBLE) ELSE"
    " h / (1.0 - CAST(ties_t AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    " - CAST(n AS DOUBLE))) END"
)


def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kruskal–Wallis H across all five market segments on
    order value — the k-group extension of ``q_mann_whitney`` (same
    doubled-tie-rank prefix-sum device), answering "do ANY segments
    differ in level" in one test instead of 10 pairwise U tests.

    Exact parts: pooled doubled ranks 2·pre + t + 1 via one
    range-partitioned prefix sum over the |distinct values| aggregate;
    per-group doubled rank sums R2_g and the tie term Σ(t³−t) close as
    bigints (R2_g ≤ 2n² — inside 2^53 to n ~ 6e7). H and its tie
    correction are one double expression whose group sum is a
    fixed-order pivoted five-term chain (double addition is not
    associative; a SUM over a group set would be partition-order
    dependent).
    """
    from locopy_spark.operators.ranking import global_running_sum

    from locopy_spark.functions.cache import managed_persist

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # persist the segmented value base (r11): the pooled value grid
    # (rank device + tie term) and the per-(value, segment) cells all
    # consume it — un-persisted, the orders scan + broadcast join
    # replayed three times
    base = managed_persist(
        o.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            o["o_custkey"] == F.col("c_custkey"),
        ).select(
            F.col("c_mktsegment").alias("seg"),
            F.expr(
                f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)"
            ).alias("v"),
        ),
        "kruskal_wallis",
    )
    pv = base.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    cum = global_running_sum(pv, order_cols=["v"], value_col="t",
                             out_col="pre")
    dr = cum.select("v", F.expr("2 * pre + t + 1").alias("dr"))
    cell = base.groupBy("v", "seg").agg(F.count(F.lit(1)).alias("tg"))
    per_g = (
        cell.join(dr, "v")
        .groupBy("seg")
        .agg(
            F.sum("tg").alias("n_g"),
            F.expr(
                "CAST(SUM(CAST(tg AS DECIMAL(38,0)) * dr) AS BIGINT)"
            ).alias("r2_g"),
        )
    )
    piv_exprs = []
    for s in KW_SEGMENTS:
        k = s.lower()
        piv_exprs.append(
            F.expr(
                f"CAST(COALESCE(MAX(CASE WHEN seg = '{s}' THEN n_g END), 0)"
                " AS BIGINT)"
            ).alias(f"n_{k}")
        )
        piv_exprs.append(
            F.expr(
                f"CAST(COALESCE(MAX(CASE WHEN seg = '{s}' THEN r2_g END), 0)"
                " AS BIGINT)"
            ).alias(f"r2_{k}")
        )
    piv = per_g.agg(*piv_exprs)
    ties = pv.agg(
        F.sum("t").alias("n"),
        F.expr(
            "CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t) AS BIGINT)"
        ).alias("ties_t"),
    )
    row = piv.crossJoin(F.broadcast(ties)).withColumn("h", F.expr(_KW_H))
    keep = ["n", "ties_t"]
    for s in KW_SEGMENTS:
        keep += [f"n_{s.lower()}", f"r2_{s.lower()}"]
    return row.select(*keep, "h", F.expr(_KW_HC).alias("h_tie_corrected"))


_KW_PIV_DUCK = ",\n           ".join(
    f"CAST(COALESCE(MAX(CASE WHEN seg = '{s}' THEN n_g END), 0) AS BIGINT)"
    f" AS n_{s.lower()},\n           "
    f"CAST(COALESCE(MAX(CASE WHEN seg = '{s}' THEN r2_g END), 0) AS BIGINT)"
    f" AS r2_{s.lower()}"
    for s in KW_SEGMENTS
)
_KW_KEEP = ", ".join(
    f"n_{s.lower()}, r2_{s.lower()}" for s in KW_SEGMENTS
)

ORACLE["q_kruskal_wallis"] = f"""
  WITH base AS (
    SELECT c_mktsegment AS seg,
           CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT) AS v
    FROM orders JOIN customer ON o_custkey = c_custkey
  ),
  pv AS (SELECT v, COUNT(*) AS t FROM base GROUP BY 1),
  dr AS (
    SELECT v, 2 * CAST(COALESCE(SUM(t) OVER (
             ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) + t + 1 AS dr
    FROM pv
  ),
  cell AS (SELECT v, seg, COUNT(*) AS tg FROM base GROUP BY 1, 2),
  per_g AS (
    SELECT seg, CAST(SUM(tg) AS BIGINT) AS n_g,
           CAST(SUM(CAST(tg AS HUGEINT) * dr) AS BIGINT) AS r2_g
    FROM cell JOIN dr USING (v) GROUP BY 1
  ),
  piv AS (
    SELECT {_KW_PIV_DUCK}
    FROM per_g
  ),
  ties AS (
    SELECT CAST(SUM(t) AS BIGINT) AS n,
           CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS BIGINT) AS ties_t
    FROM pv
  ),
  h AS (SELECT *, {_KW_H} AS h FROM piv, ties)
  SELECT n, ties_t, {_KW_KEEP}, h, {_KW_HC} AS h_tie_corrected
  FROM h
"""


# -- two-group log-rank test ---------------------------------------------------

LOGRANK_SEG = "AUTOMOBILE"


def q_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test: does customer lifetime (the
    q_kaplan_meier churn model — event when the last order sits more
    than {KM_CHURN_DAYS} days before the horizon, censored otherwise)
    differ between the '{LOGRANK_SEG}' market segment and everyone
    else? THE standard significance companion to the survival curves:
    KM/NA show the two curves, this one row says whether the gap is
    real (|z| ≳ 1.96 at 5%).

    Scale shape: one partial-aggregated span per customer (the shared
    span_state device, plus one customer-dimension join for the group
    flag), one groupBy down to the |distinct lifetimes|-bounded exit
    table, and TWO range-partitioned exclusive prefix sums
    (operators.ranking.global_running_sum — no one-partition window)
    for the group/overall risk sets. Every per-event-time term is
    exact fixed point: E1 accumulates ⌊d·n1·1e9/n⌋ (ppb), the
    hypergeometric variance accumulates
    ⌊d·n1·(n−n1)·(n−d)·1e9/(n²·(n−1))⌋ — products widen through
    DECIMAL(38,0)/HUGEINT (≤ ~5e29 at 1.5e5 customers, quotients fit
    bigint at any N where d ≤ n), and the single final double
    (z = (O1·1e9 − E1)/√(V·1e9)) is byte-identical on both engines.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's survival family.
    """
    return logrank_report(
        grouped_span_state(
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "customer"),
        )
    )


def grouped_span_state(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """The grouped per-customer span state ``(o_custkey, g1, first_d,
    last_d)``: the span_state (MIN, MAX) monoid per key plus the
    static group flag from the customer dim (constant per key, so the
    streaming merge keys on (custkey, g1) and any batching/arrival
    order reproduces the batch spans); |customers| rows forever.
    Shared by ``q_logrank`` and ``streaming.stateful.stream_logrank``."""
    grp = customer.select(
        "c_custkey",
        F.expr(
            f"cast(c_mktsegment = '{LOGRANK_SEG}' as int)"
        ).alias("g1"),
    )
    span = span_state(orders)
    return span.join(grp, span["o_custkey"] == F.col("c_custkey")).select(
        "o_custkey", "g1", "first_d", "last_d"
    )


def logrank_report(state: DataFrame) -> DataFrame:
    """Close the log-rank panel over any (o_custkey, g1, first_d,
    last_d) grouped span state."""
    from locopy_spark.operators.ranking import global_running_sum

    # NO persist (r12 session 2): the session-1 state persist targeted
    # the prefix-sum device's sampler re-reads, which the bounded
    # window arm below removed; re-A/B'd after that change the persist
    # LOSES (1.37 vs 1.00 s min without) — mx/per_t/tot re-reads of
    # the cheap span chain cost less than the cache barrier.
    mx = state.agg(F.max("last_d").alias("mx"))
    life = state.crossJoin(F.broadcast(mx)).select(
        F.expr("datediff(last_d, first_d)").alias("t"),
        F.expr(
            f"cast(datediff(mx, last_d) > {KM_CHURN_DAYS} as int)"
        ).alias("ev"),
        "g1",
    )
    per_t = life.groupBy("t").agg(
        F.sum("ev").alias("d"),
        F.sum(F.expr("ev * g1")).alias("d1"),
        F.count(F.lit(1)).alias("m"),
        F.sum("g1").alias("m1"),
    )
    # bounded arm (r12): per_t is the lifetime-day grid (<= |calendar
    # days| rows at any volume); the two nested prefixes share ONE
    # SinglePartition exchange instead of two range passes + samplers.
    cum = global_running_sum(
        global_running_sum(per_t, order_cols=["t"], value_col="m",
                           out_col="pre_m", bounded=True),
        order_cols=["t"], value_col="m1", out_col="pre_m1", bounded=True,
    )
    tot = life.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("g1").alias("n1_all"),
    )
    risk = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "d", "d1", "n_all", "n1_all",
        "n_all - pre_m AS n",
        "n1_all - pre_m1 AS n1",
    )
    terms = risk.filter("d >= 1").selectExpr(
        "d1",
        "n_all",
        "n1_all",
        "CAST(d AS DECIMAL(38,0)) * n1 * 1000000000 div n AS e1",
        "CASE WHEN n > 1 THEN"
        " CAST(d AS DECIMAL(38,0)) * n1 * (n - n1) * (n - d)"
        " * 1000000000 div (CAST(n AS DECIMAL(38,0)) * n * (n - 1))"
        " ELSE 0 END AS v",
    )
    return terms.groupBy("n_all", "n1_all").agg(
        F.sum("d1").alias("o1_events"),
        F.sum("e1").alias("e1_ppb"),
        F.sum("v").alias("var_ppb"),
    ).selectExpr(
        "CAST(n1_all AS BIGINT) AS n1_customers",
        "CAST(n_all - n1_all AS BIGINT) AS n0_customers",
        "CAST(o1_events AS BIGINT) AS o1_events",
        "CAST(e1_ppb AS BIGINT) AS e1_ppb",
        "CAST(var_ppb AS BIGINT) AS var_ppb",
        "CASE WHEN var_ppb > 0 THEN"
        " (CAST(o1_events AS DOUBLE) * 1.0e9 - CAST(e1_ppb AS DOUBLE))"
        " / SQRT(CAST(var_ppb AS DOUBLE) * 1.0e9)"
        " ELSE NULL END AS z_score",
    )


ORACLE["q_logrank"] = f"""
  WITH span AS (
    SELECT o_custkey,
           MIN(CAST(o_orderdate AS DATE)) AS fd,
           MAX(CAST(o_orderdate AS DATE)) AS ld
    FROM orders GROUP BY 1
  ),
  mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mx FROM orders),
  life AS (
    SELECT datediff('day', fd, ld) AS t,
           CAST(datediff('day', ld, mx) > {KM_CHURN_DAYS} AS INT) AS ev,
           CAST(c_mktsegment = '{LOGRANK_SEG}' AS INT) AS g1
    FROM span JOIN customer ON o_custkey = c_custkey, mx
  ),
  per_t AS (
    SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
           CAST(SUM(ev * g1) AS BIGINT) AS d1,
           COUNT(*) AS m, CAST(SUM(g1) AS BIGINT) AS m1
    FROM life GROUP BY 1
  ),
  tot AS (
    SELECT COUNT(*) AS n_all, CAST(SUM(g1) AS BIGINT) AS n1_all
    FROM life
  ),
  risk AS (
    SELECT d, d1, n_all, n1_all,
           n_all - COALESCE(SUM(m) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS n,
           n1_all - COALESCE(SUM(m1) OVER (
             ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS n1
    FROM per_t, tot
  ),
  terms AS (
    SELECT d1, n_all, n1_all,
           CAST(d AS HUGEINT) * n1 * 1000000000 // n AS e1,
           CASE WHEN n > 1 THEN
             CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d)
             * 1000000000 // (CAST(n AS HUGEINT) * n * (n - 1))
           ELSE 0 END AS v
    FROM risk WHERE d >= 1
  ),
  agg AS (
    SELECT n_all, n1_all,
           CAST(SUM(d1) AS BIGINT) AS o1_events,
           CAST(SUM(e1) AS BIGINT) AS e1_ppb,
           CAST(SUM(v) AS BIGINT) AS var_ppb
    FROM terms GROUP BY 1, 2
  )
  SELECT CAST(n1_all AS BIGINT) AS n1_customers,
         CAST(n_all - n1_all AS BIGINT) AS n0_customers,
         o1_events, e1_ppb, var_ppb,
         CASE WHEN var_ppb > 0 THEN
           (CAST(o1_events AS DOUBLE) * 1.0e9 - CAST(e1_ppb AS DOUBLE))
           / SQRT(CAST(var_ppb AS DOUBLE) * 1.0e9)
         ELSE NULL END AS z_score
  FROM agg
"""
