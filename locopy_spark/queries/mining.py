"""Pattern-mining / experimentation / relevance queries: market-basket
co-occurrence, robust outlier detection, growth trends, A/B testing,
BM25 relevance, per-document keyword extraction, and trailing-window
anomaly flags.

The warehouse workloads locopy users run AFTER the COPY lands
(reference: locopy/redshift.py:235 leaves analysis to user SQL),
re-expressed Spark-first with the repo's determinism rules: counts and
money stay exact integers through every shuffle; the only doubles are
final formulas written ONCE and formatted into byte-identical
expression text for Spark and DuckDB (the ``stats._CORR`` scheme), so
IEEE arithmetic — +,-,*,/ and sqrt are all correctly rounded — gives
bit-equal results on both engines. Integer ratio scores use floor
division (Spark ``div`` / DuckDB ``//``) on non-negative operands,
where the two semantics agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from locopy_spark.functions.cache import managed_persist
from locopy_spark.functions.numeric import SCALE
from locopy_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}

# -- market basket ----------------------------------------------------------

MB_MIN_SUPPORT = 2  # pair must co-occur in >= 2 orders


def basket_pairs_expr(ps: str, a: str, b: str) -> str:
    """Ordered within-basket pair expansion over a SORTED array column
    — the shared kernel of q_market_basket and q_graph_triangles (one
    expression text, so a semantics fix cannot miss a copy)."""
    return (
        f"flatten(transform({ps}, (x, i) ->"
        f" transform(slice({ps}, i + 2, size({ps})),"
        f" y -> struct(x AS {a}, y AS {b}))))"
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct co-purchase edge list (a < b): parts sharing an order.
    The ONE copy of the basket → pair-expansion → distinct scaffolding
    shared by q_graph_triangles, q_pagerank, and their tests."""
    from locopy_spark.functions.parallel import ensure_group_parallelism

    l = ensure_group_parallelism(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    )
    baskets = l.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        baskets.select(
            F.explode(F.expr(basket_pairs_expr("ps", "a", "b"))).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-pair co-occurrence with support counts and lift — market
    basket affinity over order line items.

    One shuffle builds per-order BASKETS (``collect_set`` bounded by
    TPC-H's ≤7 lines/order); the quadratic pair expansion then runs
    JVM-side inside whole-stage codegen as a nested array
    ``transform`` over the sorted basket (≤21 structs per order) — no
    self-join, so the fact table is never re-shuffled against itself
    (A/B-measured 2× faster than the distinct+self-equi-join shape at
    sf0.1: 2.0-2.6 s vs 5.3 s warm). ``sort_array`` makes pa<pb
    ordering deterministic regardless of ``collect_set`` arrival
    order. Item supports come from exploding the persisted |orders|-
    sized basket table (never rescanning lineitem) and broadcast back;
    the order total rides in as a 1-row broadcast. Lift is computed in
    double from exact bigint supports via engine-identical text.
    """
    from locopy_spark.functions.parallel import ensure_group_parallelism

    l = ensure_group_parallelism(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    )
    baskets = managed_persist(
        l.groupBy("l_orderkey").agg(
            F.sort_array(F.collect_set("l_partkey")).alias("ps")
        ),
        "market_basket",
    )
    pairs = (
        baskets.select(
            F.explode(F.expr(basket_pairs_expr("ps", "pa", "pb"))).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= MB_MIN_SUPPORT)
    )
    item = (
        baskets.select(F.explode("ps").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    out = (
        pairs.join(
            F.broadcast(item.select(F.col("pk").alias("pa"),
                                    F.col("cnt").alias("cnt_a"))),
            "pa",
        )
        .join(
            F.broadcast(item.select(F.col("pk").alias("pb"),
                                    F.col("cnt").alias("cnt_b"))),
            "pb",
        )
        .crossJoin(F.broadcast(tot))
    )
    return out.select(
        "pa",
        "pb",
        "pair_cnt",
        "cnt_a",
        "cnt_b",
        F.expr(
            "CAST(pair_cnt AS DOUBLE) * n_orders"
            " / (CAST(cnt_a AS DOUBLE) * cnt_b)"
        ).alias("lift"),
    ).orderBy(F.desc("pair_cnt"), "pa", "pb")


ORACLE["q_market_basket"] = f"""
  WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
  pairs AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS pair_cnt
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= {MB_MIN_SUPPORT}
  ),
  item AS (SELECT l_partkey, COUNT(*) AS cnt FROM op GROUP BY 1),
  tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op)
  SELECT pa, pb, pair_cnt, ia.cnt AS cnt_a, ib.cnt AS cnt_b,
         CAST(pair_cnt AS DOUBLE) * n_orders
           / (CAST(ia.cnt AS DOUBLE) * ib.cnt) AS lift
  FROM pairs JOIN item ia ON ia.l_partkey = pa
             JOIN item ib ON ib.l_partkey = pb
             CROSS JOIN tot
  ORDER BY pair_cnt DESC, pa, pb
"""


# -- robust outliers --------------------------------------------------------

def q_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per return flag: exact discrete
    quartiles (value at ``ceil(q*n)`` — the ``q_mad`` rank-select) on
    scaled bigint prices, fences evaluated in doubled integers
    (``2v > 2q3 + 3iqr``) so no fractional arithmetic ever appears.

    One per-group rank window (bounded by the group's rows) computes
    both quartiles in a single pass; the 3-row quartile table
    broadcasts back onto the scan for the fence count.
    """
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        "l_returnflag",
        F.expr(
            f"cast(floor(l_extendedprice * {SCALE} + 0.5) as bigint)"
        ).alias("v"),
    )
    wr = Window.partitionBy("l_returnflag").orderBy("v")
    wn = Window.partitionBy("l_returnflag")
    quart = (
        base.withColumn("__rn", F.row_number().over(wr))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
        .groupBy("l_returnflag")
        .agg(
            F.max("__n").alias("n"),
            F.max(
                F.expr(
                    "case when __rn = cast(ceil(0.25 * __n) as bigint)"
                    " then v end"
                )
            ).alias("q1"),
            F.max(
                F.expr(
                    "case when __rn = cast(ceil(0.75 * __n) as bigint)"
                    " then v end"
                )
            ).alias("q3"),
        )
    )
    flagged = (
        base.join(F.broadcast(quart), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                F.expr(
                    "CAST(2 * v > 2 * q3 + 3 * (q3 - q1)"
                    " OR 2 * v < 2 * q1 - 3 * (q3 - q1) AS INT)"
                )
            ).alias("n_outliers")
        )
    )
    return (
        quart.join(flagged, "l_returnflag")
        .select("l_returnflag", "n", "q1", "q3", "n_outliers")
        .orderBy("l_returnflag")
    )


ORACLE["q_outlier_iqr"] = f"""
  WITH b AS (
    SELECT l_returnflag,
           CAST(FLOOR(l_extendedprice * {SCALE} + 0.5) AS BIGINT) AS v
    FROM lineitem
  ),
  r AS (
    SELECT l_returnflag, v,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
           COUNT(*) OVER (PARTITION BY l_returnflag) AS n
    FROM b
  ),
  quart AS (
    SELECT l_returnflag, MAX(n) AS n,
           MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT) THEN v END) AS q1,
           MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT) THEN v END) AS q3
    FROM r GROUP BY 1
  )
  SELECT q.l_returnflag, q.n, q.q1, q.q3,
         CAST(SUM(CAST(2 * b.v > 2 * q.q3 + 3 * (q.q3 - q.q1)
                    OR 2 * b.v < 2 * q.q1 - 3 * (q.q3 - q.q1) AS INT))
              AS BIGINT) AS n_outliers
  FROM b JOIN quart q ON b.l_returnflag = q.l_returnflag
  GROUP BY 1, 2, 3, 4 ORDER BY 1
"""


# -- growth trend -----------------------------------------------------------

def q_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: exact monthly cents via one
    partial-aggregated shuffle, then ``lag`` over the ~|months|-row
    aggregate (bounded at any SF — the unpartitioned window sorts the
    MONTHLY table, never raw orders). Growth is a double ratio of
    exact bigints with engine-identical text; the first month is NULL.
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.expr("year(o_orderdate) * 100 + month(o_orderdate)").alias("ym")
    ).agg(
        F.sum(
            F.expr(f"cast(floor(o_totalprice * {SCALE} + 0.5) as bigint)")
        ).alias("rev")
    )
    w = Window.orderBy("ym")
    return (
        monthly.withColumn("prev_rev", F.lag("rev").over(w))
        .select(
            "ym",
            "rev",
            "prev_rev",
            F.expr(
                "CAST(rev - prev_rev AS DOUBLE) * 100.0"
                " / CAST(prev_rev AS DOUBLE)"
            ).alias("growth_pct"),
        )
        .orderBy("ym")
    )


ORACLE["q_mom_growth"] = f"""
  WITH monthly AS (
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
           SUM(CAST(FLOOR(o_totalprice * {SCALE} + 0.5) AS BIGINT)) AS rev
    FROM orders GROUP BY 1
  )
  SELECT ym, CAST(rev AS BIGINT) AS rev,
         CAST(LAG(rev) OVER (ORDER BY ym) AS BIGINT) AS prev_rev,
         CAST(rev - LAG(rev) OVER (ORDER BY ym) AS DOUBLE) * 100.0
           / CAST(LAG(rev) OVER (ORDER BY ym) AS DOUBLE) AS growth_pct
  FROM monthly ORDER BY ym
"""


# -- A/B test ---------------------------------------------------------------

# Degenerate cells (an empty arm, zero conversions, or 100%
# conversion — all possible mid-stream) zero the pooled variance:
# NULL, not an ANSI divide-by-zero crash.  Guarded at the TEMPLATE
# level so every call site (q_ab_test, q_funnel_sig) and both engines
# agree.
_Z = (
    "CASE WHEN {n0} = 0 OR {n1} = 0 OR ({c0} + {c1}) = 0"
    " OR ({c0} + {c1}) = ({n0} + {n1}) THEN CAST(NULL AS DOUBLE) ELSE"
    " (CAST({c1} AS DOUBLE) / {n1} - CAST({c0} AS DOUBLE) / {n0})"
    " / sqrt((CAST({c0} + {c1} AS DOUBLE) / ({n0} + {n1}))"
    " * (1.0 - CAST({c0} + {c1} AS DOUBLE) / ({n0} + {n1}))"
    " * (1.0 / {n0} + 1.0 / {n1})) END"
)


AB_CONV_VALUE = 150  # conversion = a purchase above this value
# (plain "any purchase" converts 100% of users at every SF — the
# synthetic event stream gives each user ~13 events — which zeroes the
# pooled-variance denominator)


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic user split: variant =
    ``user_id % 2``, conversion = the user fired a high-value purchase
    (``value > AB_CONV_VALUE``).

    Exact distinct-user counts come from one conditional
    ``count_distinct`` aggregate (Catalyst expands to a single
    hash-distinct pass over (variant, user) — user-grain, not
    event-grain, so the shuffle carries |users| rows at 100 TB); the
    pooled z-statistic is one double formula over the four exact
    counts, byte-identical on both engines.
    """
    e = load_table(spark, sf_dir, "events")
    agg = e.agg(
        F.count_distinct(
            F.expr("case when user_id % 2 = 0 then user_id end")
        ).alias("n0"),
        F.count_distinct(
            F.expr("case when user_id % 2 = 1 then user_id end")
        ).alias("n1"),
        F.count_distinct(
            F.expr(
                "case when user_id % 2 = 0 and event_type = 'purchase'"
                f" and value > {AB_CONV_VALUE} then user_id end"
            )
        ).alias("c0"),
        F.count_distinct(
            F.expr(
                "case when user_id % 2 = 1 and event_type = 'purchase'"
                f" and value > {AB_CONV_VALUE} then user_id end"
            )
        ).alias("c1"),
    )
    fmt = dict(n0="n0", n1="n1", c0="c0", c1="c1")
    return agg.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.expr(_Z.format(**fmt)).alias("z_score"),
    )


ORACLE["q_ab_test"] = f"""
  WITH agg AS (
    SELECT
      COUNT(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END) AS n0,
      COUNT(DISTINCT CASE WHEN user_id % 2 = 1 THEN user_id END) AS n1,
      COUNT(DISTINCT CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
            AND value > {AB_CONV_VALUE} THEN user_id END) AS c0,
      COUNT(DISTINCT CASE WHEN user_id % 2 = 1 AND event_type = 'purchase'
            AND value > {AB_CONV_VALUE} THEN user_id END) AS c1
    FROM events
  )
  SELECT n0, c0, n1, c1,
         {_Z.format(n0="n0", n1="n1", c0="c0", c1="c1")} AS z_score
  FROM agg
"""


# -- BM25 relevance ---------------------------------------------------------

BM25_TERMS = ["spark", "vector", "stream"]
BM25_TOPK = 10
# k1 = 6/5, b = 3/4 as exact rationals: multiplying the per-term
# saturation tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) through by
# 20*L (avgdl = L/N) gives num = 44*tf*L, den = 20*L*tf + 6*L +
# 18*dl*N — pure integers.


def t_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword relevance over ``documents`` for a fixed query,
    top-k by score — the retrieval scorer of a training-data search
    index, in exact integer arithmetic.

    The classic k1/b saturation is cleared of fractions by scaling
    through ``20*L`` (see module constant) and the log-idf is replaced
    by the rational ``(N - df) * 1e6 div df`` — monotone in the same
    direction, and floor division on non-negative bigints is
    bit-identical across engines, where ``ln`` is only 1-ulp-accurate
    and could flip a hash. Token/df/length stats are plain
    explode→groupBy shuffles on term keys (bounded vocab); corpus
    scalars ride in as a 1-row broadcast. At petabyte scale the bigint
    products want DECIMAL(38) headroom — the shape is unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    # the token table feeds dl/stats and both query-term aggregates —
    # persisted (MEMORY_AND_DISK) so the corpus is scanned+exploded
    # once, not once per consumer
    tok = managed_persist(
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        ).filter(F.col("term") != ""),
        "bm25",
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("len_total")
    )
    qt = tok.filter(F.col("term").isin(BM25_TERMS))
    df_ = qt.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    tf = qt.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "((n_docs - df) * 1000000 div df)"
                " * ((tf * 44 * len_total * 1000)"
                " div (20 * len_total * tf + 6 * len_total"
                " + 18 * dl * n_docs))"
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_score").alias("score_scaled"))
        .orderBy(F.desc("score_scaled"), "doc_id")
        .limit(BM25_TOPK)
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

ORACLE["t_bm25"] = f"""
  WITH tok AS (
    SELECT doc_id, t.term FROM documents,
         UNNEST(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
  ),
  dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
  stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS len_total FROM dl),
  qt AS (SELECT * FROM tok WHERE term IN ({_BM25_TERMS_SQL})),
  dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
  tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM qt GROUP BY 1, 2)
  SELECT doc_id,
         CAST(SUM(((n_docs - df) * 1000000 // df)
              * ((tf * 44 * len_total * 1000)
                 // (20 * len_total * tf + 6 * len_total
                     + 18 * dl.dl * n_docs))) AS BIGINT) AS score_scaled
  FROM tf JOIN dfs USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY doc_id
  ORDER BY score_scaled DESC, doc_id LIMIT {BM25_TOPK}
"""


# -- keyword extraction -----------------------------------------------------

KW_DOC_MOD = 20  # extract for doc_id % 20 == 0
KW_TOPK = 3


def t_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``KW_TOPK`` TF-IDF keywords per sampled document: corpus
    document frequencies from one explode→distinct-groupBy pass, term
    frequencies for the target docs only (filter pushed below the
    explode), score = ``tf * 1e6 div df`` exact, ranked per doc by a
    window bounded by the doc's vocabulary.

    The df table is vocab-sized and broadcasts; at 100 TB the df
    aggregate is the only corpus-wide shuffle and is partial-
    aggregated on the term key.
    """
    d = load_table(spark, sf_dir, "documents")
    tok_all = managed_persist(
        d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        ).filter(F.col("term") != ""),
        "keyword_extract",
    )
    df_ = tok_all.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    tf = (
        tok_all.filter(F.col("doc_id") % KW_DOC_MOD == 0)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_scaled"), F.asc("term")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr("tf * 1000000 div df").alias("score_scaled"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KW_TOPK)
        .select("doc_id", "rk", "term", "tf", "df", "score_scaled")
        .orderBy("doc_id", "rk")
    )


ORACLE["t_keyword_extract"] = f"""
  WITH tok AS (
    SELECT doc_id, t.term FROM documents,
         UNNEST(string_split(text, ' ')) AS t(term)
    WHERE t.term <> ''
  ),
  dfs AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
  tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM tok
    WHERE doc_id % {KW_DOC_MOD} = 0 GROUP BY 1, 2
  ),
  scored AS (
    SELECT doc_id, term, tf, df, tf * 1000000 // df AS score_scaled,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY tf * 1000000 // df DESC, term) AS rk
    FROM tf JOIN dfs USING (term)
  )
  SELECT doc_id, rk, term, tf, df, CAST(score_scaled AS BIGINT) AS score_scaled
  FROM scored WHERE rk <= {KW_TOPK} ORDER BY doc_id, rk
"""


# -- trailing-window anomaly ------------------------------------------------

ANOM_WIN_DAYS = 28
ANOM_MIN_N = 20

_ZDAY = (
    "(CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / n)"
    " / sqrt((n * CAST(s2 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * (n - 1)))"
)


def q_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-revenue anomaly detection: each day scored against the
    TRAILING {ANOM_WIN_DAYS}-day window (strictly preceding — the
    current day never contaminates its own baseline) via mergeable
    integer power sums, ``q_rolling_corr``'s scheme with an offset
    RANGE frame.

    The window runs over the DAILY aggregate (one row per calendar
    day — thousands of rows for decades of data), so the unpartitioned
    sort is bounded at any SF; raw orders are touched once by the
    partial-aggregated groupBy. z is the one double formula,
    engine-identical; days with under {ANOM_MIN_N} trailing
    observations are unscored and excluded.

    Revenue is summed in WHOLE currency units (not the usual
    milli-unit ``SCALE``): the squared power sum must stay below 2^64,
    where DuckDB's HUGEINT→DOUBLE conversion goes through a two-part
    upper*2^64+lower sum that double-rounds (1-ulp divergence from
    Spark's correctly-rounded decimal cast — observed at sf0.01 with
    milli-units). Whole units hold to ~sf1; past that, descale the
    daily series further (z is scale-invariant).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(
            F.expr("cast(floor(o_totalprice + 0.5) as bigint)")
        ).alias("x")
    )
    w = (
        Window.orderBy("day")
        .rangeBetween(-ANOM_WIN_DAYS, -1)
    )
    win = daily.select(
        "day",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).over(w).alias("s1"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).over(w).alias("s2"),
    )
    return (
        win.filter(F.col("n") >= ANOM_MIN_N)
        .select(
            "day",
            "x",
            "n",
            F.expr(_ZDAY).alias("z"),
        )
        .withColumn("is_anomaly", F.expr("abs(z) > 2.0"))
        .orderBy("day")
    )


ORACLE["q_anomaly_days"] = f"""
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS day,
           SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS x
    FROM orders GROUP BY 1
  ),
  win AS (
    SELECT day, x,
           COUNT(*) OVER w AS n,
           SUM(CAST(x AS HUGEINT)) OVER w AS s1,
           SUM(CAST(x AS HUGEINT) * x) OVER w AS s2
    FROM daily
    WINDOW w AS (ORDER BY day
                 RANGE BETWEEN {ANOM_WIN_DAYS} PRECEDING
                       AND 1 PRECEDING)
  )
  SELECT day, CAST(x AS BIGINT) AS x, n, {_ZDAY} AS z,
         abs({_ZDAY}) > 2.0 AS is_anomaly
  FROM win WHERE n >= {ANOM_MIN_N} ORDER BY day
"""


# -- time-bounded funnel ----------------------------------------------------

FUNNEL_W_US = 24 * 3600 * 1_000_000  # each step within 24 h of the previous


def q_funnel_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-window funnel: first view → first click within 24 h
    of it → first purchase within 24 h of that, per user — the
    time-bounded variant of ``q_events_funnel`` (whose ordered funnel
    admits a purchase years after the view).

    Three conditional-min aggregates chained on the user key: each
    stage joins the |users|-sized previous-stage table back to events
    co-shuffled on user_id and keeps the earliest qualifying event.
    All comparisons are exact epoch-microsecond integers via the
    type-robust ``epoch_us``. Stage populations cross-join as 1-row
    broadcasts into the single-row report.
    """
    from locopy_spark.functions.numeric import epoch_us

    e = load_table(spark, sf_dir, "events")
    ev = e.select(
        "user_id", "event_type", epoch_us(e, "ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("us") > F.col("v_us"))
            & (F.col("us") <= F.col("v_us") + FUNNEL_W_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("us") > F.col("c_us"))
            & (F.col("us") <= F.col("c_us") + FUNNEL_W_US)
        )
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view_users"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_click_24h"))))
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase_24h")))
        )
    )


ORACLE["q_funnel_windows"] = f"""
  WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
  v AS (SELECT user_id, MIN(us) AS v_us FROM ev
        WHERE event_type = 'view' GROUP BY 1),
  c AS (SELECT ev.user_id, MIN(us) AS c_us FROM ev JOIN v USING (user_id)
        WHERE event_type = 'click' AND us > v_us
          AND us <= v_us + {FUNNEL_W_US} GROUP BY 1),
  p AS (SELECT ev.user_id, MIN(us) AS p_us FROM ev JOIN c USING (user_id)
        WHERE event_type = 'purchase' AND us > c_us
          AND us <= c_us + {FUNNEL_W_US} GROUP BY 1)
  SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
         (SELECT COUNT(*) FROM c) AS n_click_24h,
         (SELECT COUNT(*) FROM p) AS n_purchase_24h
"""


# -- mergeable-sketch distinct rollup ---------------------------------------

HLL_TOL = 0.10  # HLL estimate must land within 10% of exact


def q_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-mergeable distinct counting: per-event-type HLL sketches
    of the user set, merged with ``hll_union_agg`` into a global
    estimate — the rollup shape that lets 100 TB of per-partition /
    per-day distinct state merge in O(sketch bytes) instead of
    reshuffling raw keys (exact distincts do not merge).

    Correctness contract is the tolerance-tripwire pattern of
    ``q_approx_distinct``: exact counts are computed cross-engine and
    hashed; the Spark-only HLL estimate appears as a boolean
    within-10% check (DuckDB's approx sketch is a different algorithm
    and can never hash-match).
    """
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("n_exact_type"),
    )
    merged = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count(F.lit(1)).alias("n_sources"),
        F.max("n_exact_type").alias("max_exact_type"),
    )
    exact = e.agg(F.count_distinct("user_id").alias("n_exact"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_sources",
        "max_exact_type",
        "n_exact",
        F.expr(
            f"abs(est - CAST(n_exact AS DOUBLE)) <= {HLL_TOL} * n_exact"
        ).alias("est_within_tol"),
    )


ORACLE["q_hll_union"] = """
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_sources,
         (SELECT CAST(MAX(n) AS BIGINT) FROM (
            SELECT COUNT(DISTINCT user_id) AS n FROM events GROUP BY event_type
          )) AS max_exact_type,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
         TRUE AS est_within_tol
  FROM events
"""


# -- epoch planning under a token budget ------------------------------------

EPOCH_BUDGET_X = 3  # train-token budget = 3x the corpus token mass
EPOCH_MAX_PPM = 4_000_000  # repeat any source at most 4 epochs


def p_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch planning: given a training-token budget
    (``EPOCH_BUDGET_X`` × corpus mass) and a uniform per-source target
    share, compute each source's repeat factor (epochs, ppm) capped at
    ``EPOCH_MAX_PPM`` — the recipe step that decides how many times
    each domain is traversed when the desired mixture wants more
    tokens than the domain has.

    Shape mirrors ``p_mix_weights``: row-local token counts (no
    explode), one partial-aggregated shuffle on the handful of source
    keys, scalar totals broadcast back. The repeat factor is exact
    integer ppm (floor div on non-negative bigints), so the plan
    hash-matches cross-engine; achieved tokens = n_tokens ×
    epochs_ppm / 1e6, also exact.
    """
    from locopy_spark.functions.text import tokens_expr

    docs = load_table(spark, sf_dir, "documents")
    per_src = (
        docs.select(
            "source", F.expr(f"size({tokens_expr('text')})").alias("n_toks")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    return (
        per_src.join(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                f"least(CAST({EPOCH_MAX_PPM} AS BIGINT),"
                f" tot_tokens * {EPOCH_BUDGET_X} * 1000000"
                " div (n_sources * n_tokens))"
            ).alias("epochs_ppm"),
        )
        .withColumn(
            "planned_tokens",
            F.expr("n_tokens * epochs_ppm div 1000000"),
        )
        .orderBy("source")
    )


ORACLE["p_epoch_plan"] = f"""
  WITH per_src AS (
    SELECT source, COUNT(*) AS n_docs,
           SUM(len(string_split_regex(lower(trim(text)), '\\s+')))
             AS n_tokens
    FROM documents GROUP BY 1
  ),
  totals AS (
    SELECT SUM(n_tokens) AS tot_tokens, COUNT(*) AS n_sources
    FROM per_src
  )
  SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(least(CAST({EPOCH_MAX_PPM} AS BIGINT),
              tot_tokens * {EPOCH_BUDGET_X} * 1000000
                // (n_sources * n_tokens)) AS BIGINT) AS epochs_ppm,
         CAST(n_tokens * least(CAST({EPOCH_MAX_PPM} AS BIGINT),
              tot_tokens * {EPOCH_BUDGET_X} * 1000000
                // (n_sources * n_tokens)) // 1000000 AS BIGINT)
           AS planned_tokens
  FROM per_src CROSS JOIN totals
  ORDER BY source
"""


# -- change-point detection -------------------------------------------------

def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on the daily revenue series: the
    day maximizing |cumulative deviation from the global mean| — the
    classic level-shift locator, fraction-free.

    ``cusum_k = Σ_{i≤k} x_i − k·mean`` multiplied through by ``n``
    becomes ``n·prefix_k − k·s`` — pure bigint/decimal arithmetic, so
    the argmax is exact on every engine (no float drift over long
    prefixes). One partial-aggregated shuffle to the daily grain, one
    prefix-sum window over the bounded daily series, one 1-row
    broadcast of (n, s), and a 1-row TakeOrdered for the argmax
    (deterministic tie-break on the earlier day).
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.expr(
            "datediff(cast(o_orderdate as date), date'1970-01-01')"
        ).alias("day")
    ).agg(
        F.sum(
            F.expr("cast(floor(o_totalprice + 0.5) as bigint)")
        ).alias("x")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).over(w).alias("prefix"),
        F.row_number().over(Window.orderBy("day")).alias("k"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0))")).alias("s"),
    )
    return (
        pre.crossJoin(F.broadcast(tot))
        .select(
            "day",
            "k",
            "n",
            F.expr("CAST(n * prefix - k * s AS DECIMAL(38,0))").alias(
                "drift_n"
            ),
        )
        .orderBy(F.expr("abs(drift_n)").desc(), F.asc("day"))
        .limit(1)
        .select(
            F.col("day").alias("change_day"),
            "k",
            F.expr("CAST(drift_n AS DOUBLE) / CAST(n * n AS DOUBLE)").alias(
                "mean_shift_area"
            ),
            "n",
        )
    )


ORACLE["q_cusum"] = """
  WITH daily AS (
    SELECT datediff('day', DATE '1970-01-01',
                    CAST(o_orderdate AS DATE)) AS day,
           SUM(CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)) AS x
    FROM orders GROUP BY 1
  ),
  pre AS (
    SELECT day,
           SUM(CAST(x AS HUGEINT)) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
           ROW_NUMBER() OVER (ORDER BY day) AS k
    FROM daily
  ),
  tot AS (
    SELECT COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s FROM daily
  )
  SELECT day AS change_day, k,
         CAST(n * prefix - k * s AS DOUBLE)
           / CAST(n * n AS DOUBLE) AS mean_shift_area,
         CAST(n AS BIGINT) AS n
  FROM pre CROSS JOIN tot
  ORDER BY abs(n * prefix - k * s) DESC, day LIMIT 1
"""


# -- stratified split -------------------------------------------------------

STRAT_TEST = 10  # percent
STRAT_VAL = 10


def p_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test assignment: EXACT ``ceil``-quota
    proportions inside every (source, lang) stratum — the guarantee
    the uniform md5-gate split (``d_hash_split``) can't give for small
    strata, where binomial noise can leave a stratum with no eval rows
    at all.

    Rows rank inside their stratum by md5(doc_id) (uniform
    pseudorandom, engine-portable, tie-broken by doc_id); the first
    ceil(10%·n) are test, the next ceil(10%·n) val. One rank window
    per stratum — bounded by the stratum's rows, the same shape at any
    corpus size; no global sort, no collect.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy(
        F.expr("md5(cast(doc_id as string))"), "doc_id"
    )
    wn = Window.partitionBy("source", "lang")
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "split",
            F.expr(
                f"case when rn <= ceil(0.{STRAT_TEST:02d} * n) then 'test'"
                f" when rn <= ceil(0.{STRAT_TEST + STRAT_VAL:02d} * n)"
                " then 'val' else 'train' end"
            ),
        )
        .select("doc_id", "source", "lang", "split")
        .orderBy("doc_id")
    )


ORACLE["p_stratified_split"] = f"""
  WITH r AS (
    SELECT doc_id, source, lang,
           ROW_NUMBER() OVER (PARTITION BY source, lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY source, lang) AS n
    FROM documents
  )
  SELECT doc_id, source, lang,
         CASE WHEN rn <= CEIL(0.{STRAT_TEST:02d} * n) THEN 'test'
              WHEN rn <= CEIL(0.{STRAT_TEST + STRAT_VAL:02d} * n) THEN 'val'
              ELSE 'train' END AS split
  FROM r ORDER BY doc_id
"""


def q_graph_triangles(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame | None = None,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Triangle census of the co-purchase graph (parts are nodes, an
    edge = the pair shared an order) — the graph-analytics primitive
    behind community/affinity analysis, via the degree-oriented
    edge-iterator counter in ``operators.graph.triangle_census``
    (out-degrees bounded O(√m); the 41 M-wedge stream at sf0.1 is
    never materialized — 13.0 s → 7.0 s vs the wedge-join shape,
    identical counts).

    Shape: basket pair expansion (the q_market_basket kernel — no
    lineitem self-join) builds the distinct edge list once
    (persisted: the census walks it four times), then only |E|-sized
    shuffles and broadcast degree/adjacency joins inside the census.
    Output is one row of exact counts + the standard global
    clustering coefficient 3T/W (W = undirected wedges).
    """
    from locopy_spark.operators.graph import triangle_census

    e = managed_persist(
        edges if edges is not None else copurchase_edges(spark, sf_dir),
        "graph_triangles",
    )
    # derive + persist the degree table HERE (same scope as the edge
    # persist): the census reads it three times (orientation joins +
    # the stats aggregate), and un-persisted each read would replay
    # the |2E| endpoint shuffle (r11)
    if degrees is None:
        degrees = managed_persist(
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d")),
            "graph_triangles",
        )
    return triangle_census(e, degrees=degrees)


ORACLE["q_graph_triangles"] = """
  WITH b AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e AS (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  deg AS (
    SELECT v, count(*) AS d
    FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1
  ),
  o AS (
    SELECT CASE WHEN (da.d, a) < (db.d, b) THEN a ELSE b END AS u,
           CASE WHEN (da.d, a) < (db.d, b) THEN b ELSE a END AS w
    FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
  ),
  owedges AS (
    SELECT o1.u, o1.w AS x, o2.w AS y
    FROM o o1 JOIN o o2 ON o1.u = o2.u AND o1.w < o2.w
  ),
  tri AS (
    SELECT w.* FROM owedges w
    JOIN e ON e.a = least(w.x, w.y) AND e.b = greatest(w.x, w.y)
  ),
  wd AS (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS w FROM deg)
  SELECT (SELECT count(*) FROM deg) AS n_nodes,
         (SELECT count(*) FROM e) AS n_edges,
         (SELECT w FROM wd) AS n_wedges,
         (SELECT count(*) FROM tri) AS n_triangles,
         3.0 * CAST((SELECT count(*) FROM tri) AS DOUBLE)
           / CAST((SELECT w FROM wd) AS DOUBLE) AS clustering_coeff
"""


# -- exponential smoothing ---------------------------------------------------

SES_START = "1997-10-01"  # fixed trailing window: bounds the sequential scan


def q_exp_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer exponential smoothing (α = ½) of daily order revenue —
    the forecasting/trend primitive, made engine-exact: the smoothing
    recurrence runs on cent-scaled bigints as s_t = (x_t + s_{t-1})
    div 2, so there is NO float accumulation anywhere and DuckDB's
    recursive CTE reproduces every value bit-for-bit (α = ½ keeps the
    recurrence a pure integer halving; arbitrary α would need
    rationals). The aggregation to the daily series is fully
    distributed; the recurrence itself is inherently sequential and
    runs as ONE Arrow task over the bounded trailing window
    (|days| ≤ ~1,400 rows — the synthetic dates run to 2001; the same
    bounded-series regime as k-means centroids), not a driver loop.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.filter(F.col("o_orderdate") >= F.lit(SES_START).cast("date"))
        .groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.expr(
                    "cast(floor(o_totalprice * 100 + 0.5) as bigint)"
                )
            ).alias("x")
        )
    )

    def ses(pdf):
        import pandas as pd

        pdf = pdf.sort_values("day").reset_index(drop=True)
        s, out = None, []
        for x in pdf["x"].tolist():
            s = x if s is None else (x + s) // 2
            out.append(s)
        pdf["s"] = out
        return pdf

    sm = (
        daily.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(ses, "__g int, day date, x long, s long")
    )
    return sm.select(
        "day",
        (F.col("x").cast("double") / 100.0).alias("revenue"),
        (F.col("s").cast("double") / 100.0).alias("smoothed"),
    ).orderBy("day")


ORACLE["q_exp_smooth"] = f"""
  WITH RECURSIVE d AS (
    SELECT o_orderdate AS day,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS x
    FROM orders WHERE o_orderdate >= DATE '{SES_START}' GROUP BY 1
  ),
  idx AS (SELECT day, x, row_number() OVER (ORDER BY day) AS t FROM d),
  ses(t, day, x, s) AS (
    SELECT t, day, x, x FROM idx WHERE t = 1
    UNION ALL
    SELECT i.t, i.day, i.x, (i.x + ses.s) // 2
    FROM idx i JOIN ses ON i.t = ses.t + 1
  )
  SELECT day, CAST(x AS DOUBLE) / 100.0 AS revenue,
         CAST(s AS DOUBLE) / 100.0 AS smoothed
  FROM ses ORDER BY day
"""


# -- PageRank ---------------------------------------------------------------

PR_ITERS = 6
PR_SCALE = 1_000_000_000_000  # initial rank mass per node (integer)
PR_TOPK = 20


def q_pagerank(
    spark: SparkSession,
    sf_dir: str,
    broadcast_ranks: bool = True,
    edges: DataFrame | None = None,
    edges_deg: DataFrame | None = None,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """PageRank over the (undirected) co-purchase graph — the canonical
    iterative graph algorithm, made engine-exact: ranks live as scaled
    BIGINTs and every step is integer arithmetic (contribution =
    r div deg, damping = 85·Σ div 100, teleport = a constant), so
    there is no float accumulation order anywhere and the DuckDB
    oracle (the same {PR_ITERS} iterations unrolled as chained CTEs —
    recursive CTEs cannot aggregate in the recursive term) reproduces
    every rank bit-for-bit. Remainders dropped by the integer
    divisions mean total mass decays slightly — identically on both
    engines; relative ranking is what PageRank is for.

    Shape: degree rides with the persisted edge table (joined once,
    repartitioned by destination), so each iteration is ZERO shuffles
    — the broadcast rank join preserves the dst partitioning and the
    contribution groupBy aggregates exchange-free; the one |E| shuffle
    is paid at the persist, not per iteration;
    ranks localCheckpoint each round (the operators/cluster.py
    Hash-Min pattern) so lineage stays O(1). ``broadcast_ranks``
    (default) is the EXPLICIT broadcast hint, right while |V| fits
    the broadcast limit; a forced hint past that limit FAILS rather
    than degrades, so on such graphs pass ``False`` — the rank join
    becomes one extra |E|-sized shuffle on src per round (same shape
    as ``triangle_census(broadcast_adj=False)``, graph.py:25),
    nothing driver-sized, identical results (unit-tested). Output:
    the top-{PR_TOPK} parts by rank, exact.
    """
    bc = F.broadcast if broadcast_ranks else (lambda df: df)
    if edges_deg is not None:
        # injected (src, dst, d) — the bench's materialized table,
        # bucketed by dst, so its scan already carries the dst
        # partitioning the iteration aggregate needs
        ed = edges_deg
        deg = (
            degrees.select(F.col("v").alias("src"), "d")
            if degrees is not None
            else edges_deg.select("src", "d").dropDuplicates(["src"])
        )
    else:
        # persist the standalone edge build (r11): und reads it twice
        # (both orientations) and the degree table once more — without
        # the persist, the basket→pair→distinct pipeline replays per
        # subtree (the rank init below reads deg AGAIN, so the whole
        # build ran up to three times pre-r11)
        e = (
            edges
            if edges is not None
            else managed_persist(copurchase_edges(spark, sf_dir), "pagerank")
        )
        und = e.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        deg = (
            degrees.select(F.col("v").alias("src"), "d")
            if degrees is not None
            else managed_persist(
                und.groupBy("src").agg(F.count(F.lit(1)).alias("d")),
                "pagerank",
            )
        )
        # degree rides WITH the edge, joined once, REPARTITIONED BY dst
        # and persisted — the broadcast rank join preserves that
        # partitioning, so the per-iteration groupBy(dst) aggregates
        # with NO exchange: all six iteration shuffles collapse into
        # this one build shuffle (A/B at sf0.1: 6.35 s → 3.59 s,
        # identical ranks)
        ed = und.join(deg, "src").repartition("dst")
    edges_deg = managed_persist(ed, "pagerank")
    # LAZY checkpoints (r11): each round's frame still truncates the
    # plan to O(1) lineage, but materialization folds into the final
    # action — the eager form paid one synchronous job per round
    # (7 jobs before the caller's own action at PR_ITERS=6)
    ranks = deg.select(
        "src", F.lit(PR_SCALE).cast("long").alias("r")
    ).localCheckpoint(eager=False)
    teleport = 15 * PR_SCALE // 100
    for _ in range(PR_ITERS):
        contrib = edges_deg.join(bc(ranks), "src").select(
            "dst", F.expr("r div d").alias("c")
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("src"))
            .agg(
                # DECIMAL(38) accumulator: 85 * a hub's summed bigint
                # contributions can pass 2^63 at large graphs, where
                # Spark long arithmetic would silently wrap while the
                # DuckDB oracle promotes to int128 — decimal keeps the
                # two engines (and the math) exact; div on decimals
                # floors like bigint div
                F.expr(
                    f"{teleport} + cast((85 * sum(cast(c as"
                    " decimal(38,0)))) div 100 as bigint)"
                ).alias("r")
            )
            .localCheckpoint(eager=False)
        )
    return (
        ranks.select(F.col("src").alias("part"), F.col("r").alias("rank_fix"))
        .orderBy(F.desc("rank_fix"), "part")
        .limit(PR_TOPK)
    )


def _oracle_pagerank() -> str:
    # unrolled iterations: pr0 -> pr1 -> ... (recursive CTEs cannot
    # aggregate in the recursive member)
    steps = []
    for i in range(1, PR_ITERS + 1):
        steps.append(
            f"""pr{i} AS (
      SELECT e.dst AS v,
             {15 * PR_SCALE // 100} + (85 * SUM(p.r // deg.d)) // 100 AS r
      FROM edges e JOIN deg ON e.src = deg.v JOIN pr{i - 1} p ON e.src = p.v
      GROUP BY e.dst
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
  WITH b AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e0 AS (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  edges AS (
    SELECT a AS src, b AS dst FROM e0
    UNION ALL SELECT b, a FROM e0
  ),
  deg AS (SELECT src AS v, count(*) AS d FROM edges GROUP BY 1),
  pr0 AS (SELECT v, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
  {chain}
  SELECT v AS part, CAST(r AS BIGINT) AS rank_fix
  FROM pr{PR_ITERS} ORDER BY rank_fix DESC, part LIMIT {PR_TOPK}
"""


ORACLE["q_pagerank"] = _oracle_pagerank()


# -- multi-source BFS reachability ------------------------------------------

REACH_SEEDS = 3  # BFS sources: the smallest node ids in the graph
REACH_HOPS = 3


def q_graph_reach(
    spark: SparkSession,
    sf_dir: str,
    broadcast_frontier: bool = True,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Multi-source BFS over the co-purchase graph: exact shortest-hop
    distance (≤ REACH_HOPS) from the REACH_SEEDS smallest part
    ids, reported as a distance histogram — the reachability /
    blast-radius primitive (recall campaigns, contamination spread)
    that completes the graph family next to CC (cluster.py), PageRank
    and the triangle census.

    Scale shape: classic frontier-expansion BFS — per hop, the
    |V|-bounded frontier and visited sets broadcast into one probe of
    the persisted edge table (no |E| shuffle per round while |V| fits
    the broadcast limit; ``broadcast_frontier=False`` is the
    beyond-limit escape hatch — the hop becomes an |E|-shuffled
    equi-join, identical results, unit-tested); the visited table
    localCheckpoints per hop so lineage stays O(1) like the PageRank
    loop (mining.py:1098). Nothing driver-sized; hop count bounds the
    rounds, not the data.
    Exact by construction (set algebra on integer keys — no floats),
    so the DuckDB oracle is the same REACH_HOPS frontier steps
    unrolled as CTEs, bit-identical.
    """
    e = edges if edges is not None else copurchase_edges(spark, sf_dir)
    und = managed_persist(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
            e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        ),
        "graph_reach",
    )
    seeds = (
        und.select("src").distinct().orderBy("src").limit(REACH_SEEDS)
    )
    # LAZY checkpoints throughout the hop loop (r11): same O(1)
    # lineage, but the per-hop materialization jobs fold into the
    # caller's single action (the eager form paid 2 jobs per hop)
    visited = seeds.select(
        "src", F.lit(0).cast("int").alias("d")
    ).localCheckpoint(eager=False)
    frontier = visited
    # frontier and visited are |V|-bounded: broadcast them into the
    # |E|-sized probe so each hop is one edge-table scan with NO edge
    # shuffle (the q_pagerank broadcast_ranks scheme, mining.py:1098);
    # past the broadcast limit pass broadcast_frontier=False and the
    # hop degrades to an |E|-shuffle equi-join — identical results
    bc = F.broadcast if broadcast_frontier else (lambda df: df)
    for hop in range(1, REACH_HOPS + 1):
        frontier = (
            und.join(bc(frontier.select("src")), "src")
            .select(F.col("dst").alias("src"))
            .distinct()
            .join(bc(visited.select("src")), "src", "left_anti")
            .select("src", F.lit(hop).cast("int").alias("d"))
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(frontier).localCheckpoint(eager=False)
    return (
        visited.groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("d")
    )


def _oracle_graph_reach() -> str:
    steps = []
    for i in range(1, REACH_HOPS + 1):
        steps.append(
            f"""f{i} AS (
      SELECT DISTINCT e.dst AS v FROM edges e
      JOIN r{i - 1} p ON e.src = p.v AND p.d = {i - 1}
    ),
    r{i} AS (
      SELECT v, d FROM r{i - 1}
      UNION ALL
      SELECT v, {i} FROM f{i}
      WHERE v NOT IN (SELECT v FROM r{i - 1})
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
  WITH b AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e0 AS (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  edges AS (
    SELECT a AS src, b AS dst FROM e0
    UNION ALL SELECT b, a FROM e0
  ),
  r0 AS (
    SELECT v, 0 AS d FROM (
      SELECT DISTINCT src AS v FROM edges ORDER BY v LIMIT {REACH_SEEDS}
    )
  ),
  {chain}
  SELECT d, COUNT(*) AS n_nodes FROM r{REACH_HOPS}
  GROUP BY d ORDER BY d
"""


ORACLE["q_graph_reach"] = _oracle_graph_reach()


# -- degree assortativity -----------------------------------------------------

def q_assortativity(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame | None = None,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Newman degree assortativity of the co-purchase graph — do
    hub parts co-occur with hubs (r > 0) or with the long tail
    (r < 0)? Equals the exact Pearson correlation of endpoint degrees
    over the DIRECTED doubling of the edge list (each undirected edge
    contributes both orientations, the standard convention).

    Shares the ``copurchase_edges`` scaffolding with
    q_graph_triangles/q_pagerank. Degrees join onto the |E| edge list
    (|V|-sized degree table), moments close as exact bigints (every
    double cast stays a correctly-rounded int64→double on both
    engines), and r is the shared Pearson expression; a regular graph
    (zero degree variance) yields NULL via an exact integer CASE
    guard rather than an ANSI divide-by-zero.
    """
    # persist the standalone edge build: the degree derivation reads it
    # twice (both endpoints) and the pair join once more — un-persisted,
    # Catalyst would replay the whole basket→pair→distinct pipeline per
    # subtree (measured 50 Exchange nodes in the pre-r11 plan)
    e = (
        edges
        if edges is not None
        else managed_persist(copurchase_edges(spark, sf_dir), "assortativity")
    )
    deg = (
        degrees
        if degrees is not None
        else managed_persist(
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d")),
            "assortativity",
        )
    )
    pairs = e.join(
        F.broadcast(
            deg.select(F.col("v").alias("a"), F.col("d").alias("dx"))
        ),
        "a",
    ).join(
        F.broadcast(
            deg.select(F.col("v").alias("b"), F.col("d").alias("dy"))
        ),
        "b",
    )
    # the directed doubling is SYMMETRIC, so its moments fold out of
    # ONE pass over the undirected pairs: n_dir = 2·n, Σdx = Σdy =
    # Σ(dx+dy), Σdx·dy doubles, Σdx² = Σdy² = Σ(dx²+dy²) — identical
    # exact integers to the unioned two-pass form (r11; the union
    # shape scanned the |E| pair join twice)
    agg = pairs.agg(
        (F.count(F.lit(1)) * 2).alias("n_dir"),
        F.expr(
            "CAST(SUM(CAST(dx AS DECIMAL(38,0)) + dy) AS BIGINT)"
        ).alias("sx"),
        F.expr(
            "CAST(SUM(CAST(dx AS DECIMAL(38,0)) + dy) AS BIGINT)"
        ).alias("sy"),
        F.expr(
            "CAST(2 * SUM(CAST(dx AS DECIMAL(38,0)) * dy) AS BIGINT)"
        ).alias("sxy"),
        F.expr(
            "CAST(SUM(CAST(dx AS DECIMAL(38,0)) * dx"
            " + CAST(dy AS DECIMAL(38,0)) * dy) AS BIGINT)"
        ).alias("sx2"),
        F.expr(
            "CAST(SUM(CAST(dx AS DECIMAL(38,0)) * dx"
            " + CAST(dy AS DECIMAL(38,0)) * dy) AS BIGINT)"
        ).alias("sy2"),
    )
    corr = (
        "(CAST(n_dir AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (sqrt(CAST(n_dir AS DOUBLE) * CAST(sx2 AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * sqrt(CAST(n_dir AS DOUBLE) * CAST(sy2 AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
    )
    guard = (
        "CAST(n_dir AS DECIMAL(38,0)) * sx2 > CAST(sx AS DECIMAL(38,0)) * sx"
    )
    return agg.select(
        F.expr("n_dir div 2").alias("n_edges"),
        "n_dir",
        F.expr(f"CASE WHEN {guard} THEN {corr} END").alias("assortativity"),
    )


ORACLE["q_assortativity"] = """
  WITH b AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e AS (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  deg AS (
    SELECT v, count(*) AS d
    FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1
  ),
  dirs AS (
    SELECT da.d AS dx, db.d AS dy
    FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
    UNION ALL
    SELECT db.d, da.d
    FROM e JOIN deg da ON e.a = da.v JOIN deg db ON e.b = db.v
  ),
  agg AS (
    SELECT COUNT(*) AS n_dir,
           CAST(SUM(CAST(dx AS HUGEINT)) AS BIGINT) AS sx,
           CAST(SUM(CAST(dy AS HUGEINT)) AS BIGINT) AS sy,
           CAST(SUM(CAST(dx AS HUGEINT) * dy) AS BIGINT) AS sxy,
           CAST(SUM(CAST(dx AS HUGEINT) * dx) AS BIGINT) AS sx2,
           CAST(SUM(CAST(dy AS HUGEINT) * dy) AS BIGINT) AS sy2
    FROM dirs
  )
  SELECT n_dir // 2 AS n_edges, n_dir,
         CASE WHEN CAST(n_dir AS HUGEINT) * sx2
                   > CAST(sx AS HUGEINT) * sx
              THEN (CAST(n_dir AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (sqrt(CAST(n_dir AS DOUBLE) * CAST(sx2 AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * sqrt(CAST(n_dir AS DOUBLE) * CAST(sy2 AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         END AS assortativity
  FROM agg
"""


# -- degree distribution -----------------------------------------------------


def q_degree_dist(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame | None = None,
    degrees: DataFrame | None = None,
) -> DataFrame:
    """Degree distribution of the co-purchase graph — the first plot
    read before running PageRank/triangles on a new graph (heavy-tail
    check: is degree-oriented iteration going to pay off, does the
    broadcast-adjacency path fit).

    Shares the ``copurchase_edges`` scaffolding with q_pagerank /
    q_graph_triangles / q_assortativity. One |E|-sized union → one
    |V|-sized degree aggregate (persisted — the histogram and the
    1-row total both read it, and without the persist Catalyst would
    rebuild the whole edge pipeline twice) → one |distinct
    degrees|-sized histogram with exact vertex/edge-endpoint shares
    in ppm (floor division through DECIMAL(38)/HUGEINT).
    """
    e = edges if edges is not None else copurchase_edges(spark, sf_dir)
    deg = managed_persist(
        degrees
        if degrees is not None
        else (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        ),
        "degree_dist",
    )
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).alias("n_vertices"))
    tot = deg.agg(
        F.count(F.lit(1)).alias("n_v"), F.sum("d").alias("sum_d")
    )
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("degree"),
            "n_vertices",
            F.expr(
                "CAST(CAST(n_vertices AS DECIMAL(38,0)) * 1000000"
                " div n_v AS BIGINT)"
            ).alias("vertex_share_ppm"),
            F.expr(
                "CAST(CAST(n_vertices AS DECIMAL(38,0)) * d * 1000000"
                " div sum_d AS BIGINT)"
            ).alias("endpoint_share_ppm"),
        )
        .orderBy("degree")
    )


ORACLE["q_degree_dist"] = """
  WITH b AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e AS (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  deg AS (
    SELECT v, COUNT(*) AS d
    FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY 1
  ),
  hist AS (SELECT d, COUNT(*) AS n_vertices FROM deg GROUP BY 1),
  tot AS (
    SELECT COUNT(*) AS n_v, CAST(SUM(d) AS BIGINT) AS sum_d FROM deg
  )
  SELECT d AS degree, n_vertices,
         CAST(CAST(n_vertices AS HUGEINT) * 1000000 // n_v AS BIGINT)
           AS vertex_share_ppm,
         CAST(CAST(n_vertices AS HUGEINT) * d * 1000000 // sum_d AS BIGINT)
           AS endpoint_share_ppm
  FROM hist, tot ORDER BY degree
"""


# -- k-core peeling -----------------------------------------------------------

KCORE_ITERS = 3


def q_kcore(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame | None = None,
    degrees: DataFrame | None = None,
    broadcast_survivors: bool = False,
) -> DataFrame:
    """Median-degree core peeling of the co-purchase graph: ``K`` is
    the EXACT 10th-percentile degree (rank ceil(n/10) under the (d, v)
    total order), then ``KCORE_ITERS`` rounds drop every vertex whose
    within-subgraph degree falls below K — the densest-region screen
    run before community/triangle analytics to know how much of the
    graph survives a degeneracy cut.  The percentile threshold (rather
    than a fixed K) keeps the cascade non-trivial at every scale
    factor of this dense graph (min degree grows with SF, so any
    constant K either peels nothing or everything).

    Shares the ``copurchase_edges`` scaffolding (persisted once).
    Each round is one |E| endpoint aggregate + two semi joins against
    the |V|-sized survivor set.  ``broadcast_survivors=True`` ships
    the survivor set into both semi joins (map-side filters, 4 fewer
    exchanges per round) — measured SLOWER here (per-round broadcast
    builds serialize the round DAGs: interleaved A/B 6.75 vs 7.52 s
    min at sf0.1) and capped by the broadcast limit at scale, so the
    shuffled sort-merge semi joins stay the default; the flag is the
    opt-in for shuffle-dominated topologies (identical cascade,
    unit-tested). The threshold rides as a 1-row
    broadcast; per-round counts are 1-row aggregates unioned into the
    ``KCORE_ITERS + 1``-row report.  Survivors and the shrunken edge
    table localCheckpoint each round (the pagerank lineage rule:
    every round's frames are referenced by three consumers, so plain
    persist leaves an analyzed plan that grows 3^depth).  The
    percentile threshold comes from the degree-histogram cumulative
    (<= 2*sqrt(|E|) rows, see inline note) — never a rank over |V|
    rows.  Fixed iteration count = fixed plan depth, the q_pagerank
    convention for iterative graph work.
    """
    bc = F.broadcast if broadcast_survivors else (lambda df: df)
    e = managed_persist(
        edges if edges is not None else copurchase_edges(spark, sf_dir),
        "kcore",
    )
    deg0 = managed_persist(
        degrees
        if degrees is not None
        else (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
        ),
        "kcore",
    )
    # Percentile threshold from the DEGREE HISTOGRAM (r12): the rank
    # ceil(n/10) element of the (d, v) total order has d = the
    # smallest degree whose cumulative count reaches the rank — the v
    # tie-break orders rows WITHIN one d bucket and can never move the
    # rank into a different bucket, so k is exact without ranking |V|
    # rows.  Replaces the global_row_number device here (its range
    # partitioner costs a separate boundary-sampling job + an |V|
    # shuffle per call).  The one-task cumulative window is provably
    # scale-safe: t distinct positive degree values sum to >= t(t+1)/2
    # while summing to <= 2|E|, so the histogram is <= 2*sqrt(|E|)
    # rows (~2M rows at |E| = 10^12).
    hist = deg0.groupBy("d").agg(F.count(F.lit(1)).alias("__c"))
    cum = hist.withColumn(
        "__cum",
        F.sum("__c").over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    total = hist.agg(F.sum("__c").alias("__total"))
    kdf = managed_persist(
        cum.crossJoin(F.broadcast(total))
        .filter(F.col("__cum") >= F.expr("(__total + 9) div 10"))
        .agg(F.min("d").alias("k")),
        "kcore",
    )
    rows = (
        deg0.agg(F.count(F.lit(1)).alias("n_vertices"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .select(F.lit(0).alias("iteration"), "n_vertices", "n_edges")
    )
    cur = e
    for i in range(1, KCORE_ITERS + 1):
        # round 1's within-subgraph degree IS deg0 (cur == e), already
        # aggregated and persisted for the percentile rank — reuse it
        # instead of replaying the |2E| endpoint shuffle (r11)
        degi = (
            deg0
            if i == 1
            else (
                cur.select(F.col("a").alias("v"))
                .unionAll(cur.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("d"))
            )
        )
        # localCheckpoint (not persist): each round references the
        # previous round's frames several times, so plain persist
        # keeps an analyzed-plan lineage that TRIPLES per iteration
        # (the runtime reads caches, but the plan object itself grows
        # 3^depth — the pagerank/graph_reach O(1)-lineage rule)
        surv = (
            degi.crossJoin(F.broadcast(kdf))
            .filter(F.col("d") >= F.col("k"))
            .select("v")
            .localCheckpoint(eager=False)
        )
        cur = (
            cur.join(bc(surv.select(F.col("v").alias("a"))), "a", "semi")
            .join(bc(surv.select(F.col("v").alias("b"))), "b", "semi")
            .localCheckpoint(eager=False)
        )
        rows = rows.unionAll(
            surv.agg(F.count(F.lit(1)).alias("n_vertices"))
            .crossJoin(cur.agg(F.count(F.lit(1)).alias("n_edges")))
            .select(F.lit(i).alias("iteration"), "n_vertices", "n_edges")
        )
    return (
        rows.crossJoin(F.broadcast(kdf))
        .select("iteration", "k", "n_vertices", "n_edges")
        .orderBy("iteration")
    )


def _kcore_oracle() -> str:
    head = """
  WITH b AS MATERIALIZED (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS MATERIALIZED (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e0 AS MATERIALIZED (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  deg0 AS MATERIALIZED (
    SELECT v, COUNT(*) AS d
    FROM (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0) GROUP BY 1
  ),
  ranked AS (
    SELECT d, ROW_NUMBER() OVER (ORDER BY d, v) AS rn,
           COUNT(*) OVER () AS n FROM deg0
  ),
  kv AS MATERIALIZED (SELECT d AS k FROM ranked WHERE rn = (n + 9) // 10),
  row0 AS (
    SELECT 0 AS iteration,
           (SELECT COUNT(*) FROM deg0) AS n_vertices,
           (SELECT COUNT(*) FROM e0) AS n_edges
  )"""
    mid = []
    for i in range(1, KCORE_ITERS + 1):
        p = i - 1
        mid.append(f"""
  deg{i} AS MATERIALIZED (
    SELECT v, COUNT(*) AS d
    FROM (SELECT a AS v FROM e{p} UNION ALL SELECT b FROM e{p}) GROUP BY 1
  ),
  surv{i} AS MATERIALIZED (SELECT v FROM deg{i}, kv WHERE d >= k),
  e{i} AS MATERIALIZED (
    SELECT a, b FROM e{p}
    WHERE a IN (SELECT v FROM surv{i}) AND b IN (SELECT v FROM surv{i})
  ),
  row{i} AS (
    SELECT {i} AS iteration,
           (SELECT COUNT(*) FROM surv{i}) AS n_vertices,
           (SELECT COUNT(*) FROM e{i}) AS n_edges
  )""")
    union = " UNION ALL ".join(
        f"SELECT * FROM row{i}" for i in range(KCORE_ITERS + 1)
    )
    return (
        head + "," + ",".join(mid) + f"""
  SELECT iteration, (SELECT k FROM kv) AS k,
         CAST(n_vertices AS BIGINT) AS n_vertices,
         CAST(n_edges AS BIGINT) AS n_edges
  FROM ({union}) ORDER BY iteration
"""
    )


ORACLE["q_kcore"] = _kcore_oracle()


# -- label-propagation communities ------------------------------------------

LPA_ITERS = 3  # fixed synchronous rounds = fixed plan depth
LPA_MIN_SUPPORT = 2  # repeat co-purchase: pair seen in >= 2 orders


def repeat_copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Support-filtered co-purchase edges (a < b, pair co-occurs in
    >= LPA_MIN_SUPPORT orders): the SPARSIFIED relation for community
    work. The raw 1-order co-purchase graph is near-complete at every
    SF (avg degree ~120 at sf0.1), where any label/mode process
    collapses to one giant blob in two rounds — measured, not
    assumed; the repeat-purchase cut leaves the genuinely associated
    pairs (3.5k edges at sf0.1). Shares the basket_pairs_expr kernel;
    support counting IS the pair aggregate, so the filter costs
    nothing extra."""
    from locopy_spark.functions.parallel import ensure_group_parallelism

    l = ensure_group_parallelism(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    )
    baskets = l.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    return (
        baskets.select(
            F.explode(F.expr(basket_pairs_expr("ps", "a", "b"))).alias("p")
        )
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("sup"))
        .filter(F.col("sup") >= LPA_MIN_SUPPORT)
        .select("a", "b")
    )


def q_lpa_communities(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame | None = None,
    broadcast_labels: bool = False,
) -> DataFrame:
    """Synchronous label-propagation communities over the repeat
    co-purchase graph — the community-detection read next to the
    component/triangle/core family (d_dup_clusters finds CONNECTED
    blobs; LPA's neighbor-majority vote splits a connected graph into
    cohesive parts). Output: the community size histogram
    (community_size, n_communities) — bounded by the size range, not
    the graph.

    Determinism: labels start as vertex ids; each round every vertex
    takes the MOST FREQUENT label among its neighbors, ties broken by
    the SMALLEST label — both reads are exact integer aggregates
    (max count, then min label among argmax), so every round is
    engine-reproducible; LPA_ITERS fixed rounds = fixed plan depth
    (the q_pagerank/q_kcore convention), labels localCheckpoint each
    round (the 3^depth analyzed-plan lesson, SURVEY §7 r6-late2).
    Scale shape: the basket pair-expansion aggregate dominates (the
    market-basket shape); each round is the |2E| neighbor-label
    equi-join plus ONE |V|-sized argmax aggregate (r11): the
    most-frequent-min-label vote folds into ``max_by(lab, struct(c,
    -lab))`` instead of the max-count self-join (argmax ordering has
    no ties: lab is unique per (v, lab) row, so the fold is exactly
    the mx-join-min chain).  ``broadcast_labels=True`` ships the
    |V|-bounded label table into the join instead — measured SLOWER
    here (per-round broadcast builds serialize the round DAGs:
    interleaved A/B 3.0 vs 4.2 s min at sf0.1) and capped by the
    broadcast limit at scale, so the shuffled join is the default;
    the flag stays for topologies where rounds are shuffle-dominated.
    No adjacency ever materializes per-row beyond the edge list.

    ``edges`` injects the SPARSIFIED relation (the
    ``repeat_copurchase_edges`` output: support-filtered (a, b)
    pairs) — the amortized shape where one support-annotated edge
    table serves every graph consumer, LPA reading the sup >=
    {LPA_MIN_SUPPORT} slice.
    """
    e = managed_persist(
        edges if edges is not None
        else repeat_copurchase_edges(spark, sf_dir),
        "lpa",
    )
    und = managed_persist(
        e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
            e.select(F.col("b").alias("v"), F.col("a").alias("u"))
        ),
        "lpa",
    )
    bc = F.broadcast if broadcast_labels else (lambda df: df)
    labels = und.select("v").distinct().select("v", F.col("v").alias("lab"))
    for _ in range(LPA_ITERS):
        nb = und.join(
            bc(labels.select(F.col("v").alias("u"), "lab")), "u"
        ).select("v", "lab")
        labels = (
            nb.groupBy("v", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("v")
            .agg(F.expr("max_by(lab, struct(c, -lab))").alias("lab"))
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("lab").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy(F.col("sz").alias("community_size"))
        .agg(F.count(F.lit(1)).alias("n_communities"))
        .orderBy("community_size")
    )


def _lpa_oracle() -> str:
    rounds = []
    prev = "lab0"
    for i in range(1, LPA_ITERS + 1):
        rounds.append(f"""
  cand{i} AS MATERIALIZED (
    SELECT und.v, l.lab, COUNT(*) AS c
    FROM und JOIN {prev} l ON und.u = l.v GROUP BY 1, 2
  ),
  mx{i} AS (SELECT v, MAX(c) AS mc FROM cand{i} GROUP BY 1),
  lab{i} AS MATERIALIZED (
    SELECT cand{i}.v, MIN(lab) AS lab
    FROM cand{i} JOIN mx{i} USING (v) WHERE c = mc GROUP BY 1
  )""")
        prev = f"lab{i}"
    return f"""
  WITH b AS MATERIALIZED (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS MATERIALIZED (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e AS MATERIALIZED (
    SELECT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
    GROUP BY 1, 2 HAVING COUNT(*) >= {LPA_MIN_SUPPORT}
  ),
  und AS MATERIALIZED (
    SELECT a AS v, b AS u FROM e UNION ALL SELECT b, a FROM e
  ),
  lab0 AS MATERIALIZED (SELECT DISTINCT v, v AS lab FROM und),
  {",".join(rounds)},
  sizes AS (SELECT lab, COUNT(*) AS sz FROM {prev} GROUP BY 1)
  SELECT CAST(sz AS BIGINT) AS community_size,
         CAST(COUNT(*) AS BIGINT) AS n_communities
  FROM sizes GROUP BY 1 ORDER BY 1
"""


ORACLE["q_lpa_communities"] = _lpa_oracle()


# -- Jaccard link prediction --------------------------------------------------------

LP_DEGCAP = 80  # hub exclusion: middle vertices above this degree carry no signal
LP_TOPK = 30


def q_jaccard_links(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame | None = None,
    degrees: DataFrame | None = None,
    adjacency: DataFrame | None = None,
) -> DataFrame:
    """Jaccard link prediction on the co-purchase graph: the top
    {LP_TOPK} NON-adjacent part pairs ranked by common-neighbor
    Jaccard — "these two parts should be cross-sold but never were",
    the forward-looking read next to q_graph_triangles' census of
    links that exist.

    Scale shape: candidate pairs come ONLY through middle vertices of
    degree ≤ {LP_DEGCAP} (hub exclusion — the Adamic-Adar intuition
    made a hard gate: a common neighbor shared with thousands of
    parts carries no pair signal, and capping the middle bounds the
    wedge stream at |V|·cap² instead of Σd² — 2.4 M vs 149 M wedges
    at sf0.1). The wedge self-join runs over the capped adjacency
    with map-side partial counting; existing edges leave by anti-join;
    degrees join |candidate|-sized. Jaccard = cn·10⁶ div (dᵤ+d𝓌−cn)
    is ONE exact ppm floor division (numerator = capped common
    neighbors, denominator = full degrees — a documented lower-bound
    score); ties break (cn, u, w)-deterministically; top-K is a
    TakeOrdered, never a global sort.

    ``adjacency``: a pre-built (v, n) capped-adjacency table (degree
    of v ≤ {LP_DEGCAP}) — the index-time artifact this query shares
    with q_clustering_coef (both wedge streams enumerate neighbor
    pairs of exactly these middles); bucketed by ``v`` the wedge
    self-join reads it pre-partitioned with zero exchange.
    CONTRACT: (v, n) rows must be DISTINCT — the positional pair
    expansion over the collected array emits u==w self-pairs if a
    neighbor repeats, where the old x.n < y.n self-join excluded
    them (copurchase_edges is distinct by construction; a non-
    distinct injection would silently inflate wedge counts).

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's graph-mining family.
    """
    e = managed_persist(
        edges if edges is not None else copurchase_edges(spark, sf_dir),
        "jaccard_links",
    )
    if degrees is not None:
        deg = degrees
    else:
        # persisted (r11): read four ways below (mid gate + both
        # endpoint joins) — un-persisted, each read replays the |2E|
        # endpoint shuffle over the edge table
        nbr_d = e.selectExpr("a AS v", "b AS n").unionAll(
            e.selectExpr("b AS v", "a AS n")
        )
        deg = managed_persist(
            nbr_d.groupBy("v").agg(F.count(F.lit(1)).alias("d")),
            "jaccard_links",
        )
    if adjacency is not None:
        mid = adjacency.select("v", "n")
    else:
        nbr = e.selectExpr("a AS v", "b AS n").unionAll(
            e.selectExpr("b AS v", "a AS n")
        )
        mid = nbr.join(deg.filter(f"d <= {LP_DEGCAP}"), "v").select("v", "n")
    # wedge stream via SORTED adjacency ARRAYS (r11): one groupBy(v)
    # collects each capped middle's neighbor list (<= LP_DEGCAP long,
    # so no skew), and the within-middle pair expansion runs JVM-side
    # inside whole-stage codegen (the q_market_basket kernel) — the
    # pre-r11 self-join shuffled the persisted mid table TWICE and
    # sort-merge-probed it to produce the same pair multiset.  On the
    # bucketed shared adjacency the groupBy reads pre-partitioned
    # storage with zero exchange.
    wedges = (
        mid.groupBy("v")
        .agg(F.sort_array(F.collect_list("n")).alias("ns"))
        .select(
            F.explode(F.expr(basket_pairs_expr("ns", "u", "w"))).alias("p")
        )
        .select("p.u", "p.w")
    )
    cn = wedges.groupBy("u", "w").agg(F.count(F.lit(1)).alias("cn"))
    cand = cn.join(
        e, (cn["u"] == e["a"]) & (cn["w"] == e["b"]), "left_anti"
    )
    du = deg.selectExpr("v AS u", "d AS deg_a")
    dw = deg.selectExpr("v AS w", "d AS deg_b")
    return (
        cand.join(du, "u")
        .join(dw, "w")
        .selectExpr(
            "u AS part_a",
            "w AS part_b",
            "cn AS common_neighbors",
            "deg_a",
            "deg_b",
            "cn * 1000000 div (deg_a + deg_b - cn) AS jaccard_ppm",
        )
        .orderBy(
            F.desc("jaccard_ppm"),
            F.desc("common_neighbors"),
            "part_a",
            "part_b",
        )
        .limit(LP_TOPK)
    )


ORACLE["q_jaccard_links"] = f"""
  WITH b AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e AS MATERIALIZED (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  nbr AS (SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e),
  deg AS MATERIALIZED (
    SELECT v, COUNT(*) AS d FROM nbr GROUP BY 1
  ),
  mid AS (
    SELECT nbr.v, nbr.n FROM nbr
    JOIN deg ON nbr.v = deg.v AND deg.d <= {LP_DEGCAP}
  ),
  wed AS (
    SELECT x.n AS u, y.n AS w
    FROM mid x JOIN mid y ON x.v = y.v AND x.n < y.n
  ),
  cnt AS (SELECT u, w, COUNT(*) AS cn FROM wed GROUP BY 1, 2),
  cand AS (
    SELECT c.* FROM cnt c
    WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = c.u AND e.b = c.w)
  )
  SELECT c.u AS part_a, c.w AS part_b,
         CAST(c.cn AS BIGINT) AS common_neighbors,
         CAST(du.d AS BIGINT) AS deg_a,
         CAST(dw.d AS BIGINT) AS deg_b,
         CAST(c.cn * 1000000 // (du.d + dw.d - c.cn) AS BIGINT)
           AS jaccard_ppm
  FROM cand c
  JOIN deg du ON c.u = du.v
  JOIN deg dw ON c.w = dw.v
  ORDER BY jaccard_ppm DESC, common_neighbors DESC, part_a, part_b
  LIMIT {LP_TOPK}
"""


# -- local clustering-coefficient profile ---------------------------------------------

CC_BAND = 100_000  # ppm per histogram band (10 bands + the cc=1 band)


def q_clustering_coef(
    spark: SparkSession,
    sf_dir: str,
    edges: DataFrame | None = None,
    degrees: DataFrame | None = None,
    adjacency: DataFrame | None = None,
) -> DataFrame:
    """Local clustering-coefficient profile of the co-purchase graph:
    for every part of degree 2..{LP_DEGCAP}, the fraction of its
    neighbor pairs that are themselves connected (cc_v =
    2·tri_v/(d_v·(d_v−1))), histogrammed into {CC_BAND}-ppm bands —
    the local-cohesion read next to q_graph_triangles' global census:
    a high-cc band full of mid-degree parts is the cross-sell-bundle
    signature, a fat cc=0 band is star-shaped catalog structure.

    Scale shape: centers are HARD-GATED to degree ≤ {LP_DEGCAP} (the
    q_jaccard_links hub exclusion, here part of the SEMANTICS — hubs'
    coefficients are numerically meaningless and their wedge sets
    quadratic), so the wedge stream is bounded by |V|·cap² instead of
    Σd²; triangles close by ONE equi-join of wedges against the edge
    list (a < b both sides, no inequality join); zero-triangle centers
    re-enter by left join. cc and band are exact ppm floor divisions;
    the result is |bands|-sized.

    ``adjacency``: the same pre-built (v, n) capped-adjacency table
    q_jaccard_links shares (degree of v ≤ {LP_DEGCAP}) — usable
    verbatim as the wedge source because the only rows it carries
    beyond the centers are degree-1 middles, which produce zero
    neighbor PAIRS in the self-join (and degree-1 vertices are
    excluded from the center denominators regardless).  Same
    distinct-(v, n) CONTRACT as q_jaccard_links (see there): a
    repeated neighbor would emit u==w self-pairs from the positional
    array expansion.

    Reference parity note: the reference (capitalone/locopy) ships no
    analytics; this extends the engine's graph-mining family.
    """
    e = managed_persist(
        edges if edges is not None else copurchase_edges(spark, sf_dir),
        "clustering_coef",
    )
    if degrees is not None:
        deg = degrees
    else:
        # persisted (r11): centers gate + the cc left join both read
        # it — un-persisted, each read replays the |2E| endpoint
        # shuffle over the edge table
        nbr_d = e.selectExpr("a AS v", "b AS n").unionAll(
            e.selectExpr("b AS v", "a AS n")
        )
        deg = managed_persist(
            nbr_d.groupBy("v").agg(F.count(F.lit(1)).alias("d")),
            "clustering_coef",
        )
    centers = deg.filter(f"d >= 2 AND d <= {LP_DEGCAP}")
    if adjacency is not None:
        mid = adjacency.select("v", "n")
    else:
        nbr = e.selectExpr("a AS v", "b AS n").unionAll(
            e.selectExpr("b AS v", "a AS n")
        )
        mid = nbr.join(centers.select("v"), "v")
    # wedge stream via sorted adjacency arrays — the q_jaccard_links
    # device (see there): one groupBy(v) + codegen pair expansion
    # replaces the double-shuffled self-join; v rides in the struct so
    # the triangle count still closes per center.  The d >= 2 bound is
    # NOT re-applied here: degree-1 middles produce zero pairs, the
    # same argument the shared-adjacency injection already relies on.
    wedges = (
        mid.groupBy("v")
        .agg(F.sort_array(F.collect_list("n")).alias("ns"))
        .select(
            "v",
            F.explode(F.expr(basket_pairs_expr("ns", "u", "w"))).alias("p"),
        )
        .select("v", "p.u", "p.w")
    )
    tri = (
        wedges.join(e, (wedges["u"] == e["a"]) & (wedges["w"] == e["b"]))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    cc = (
        centers.join(tri, "v", "left")
        .selectExpr(
            "coalesce(tri, 0) * 2000000 div (d * (d - 1)) AS cc_ppm"
        )
    )
    return (
        cc.groupBy(F.expr(f"cc_ppm div {CC_BAND}").alias("band"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("cc_ppm").alias("sum_cc_ppm"),
        )
        .selectExpr(
            "band",
            "n_nodes",
            "sum_cc_ppm div n_nodes AS avg_cc_ppm",
        )
        .orderBy("band")
    )


ORACLE["q_clustering_coef"] = f"""
  WITH b AS (
    SELECT l_orderkey, list_sort(list_distinct(list(l_partkey))) AS ps
    FROM lineitem GROUP BY 1
  ),
  ex AS (SELECT l_orderkey, unnest(ps) AS pa FROM b),
  e AS MATERIALIZED (
    SELECT DISTINCT x.pa AS a, y.pa AS b
    FROM ex x JOIN ex y ON x.l_orderkey = y.l_orderkey AND x.pa < y.pa
  ),
  nbr AS (SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e),
  deg AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM nbr GROUP BY 1),
  centers AS (
    SELECT v, d FROM deg WHERE d >= 2 AND d <= {LP_DEGCAP}
  ),
  mid AS (
    SELECT nbr.v, nbr.n FROM nbr JOIN centers c ON nbr.v = c.v
  ),
  wed AS (
    SELECT x.v, x.n AS u, y.n AS w
    FROM mid x JOIN mid y ON x.v = y.v AND x.n < y.n
  ),
  tri AS (
    SELECT wed.v, COUNT(*) AS tri
    FROM wed JOIN e ON wed.u = e.a AND wed.w = e.b
    GROUP BY 1
  ),
  cc AS (
    SELECT COALESCE(t.tri, 0) * 2000000 // (c.d * (c.d - 1)) AS cc_ppm
    FROM centers c LEFT JOIN tri t ON c.v = t.v
  )
  SELECT CAST(cc_ppm // {CC_BAND} AS BIGINT) AS band,
         COUNT(*) AS n_nodes,
         CAST(SUM(cc_ppm) // COUNT(*) AS BIGINT) AS avg_cc_ppm
  FROM cc GROUP BY 1 ORDER BY 1
"""
