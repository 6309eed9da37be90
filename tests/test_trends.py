"""Hand-computed semantics pins for the trends family (q_ols_trend,
q_holt_linear, q_theil_sen, q_benford, q_graph_reach, p_dataset_card)
— tiny inputs with pencil-and-paper expectations, beyond the aggregate
oracle hashes (SURVEY §5 test-strategy stack)."""

import datetime

import pytest

from locopy_spark.queries.trends import (
    BENFORD_PPM,
    _first_digit_case,
    benford_counts,
    benford_report,
    ols_daily,
    ols_report,
)


def _orders(spark, rows):
    """Minimal orders-shaped frame: (key, priority, date, totalprice)."""
    return spark.createDataFrame(
        [
            (k, p, datetime.date.fromisoformat(d), v)
            for k, p, d, v in rows
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate date,"
        " o_totalprice double",
    )


def test_ols_perfect_line(spark):
    """Points exactly on y = 100·t + 200 dollars → slope 100,
    intercept 200, R² = 1 (ppb-floored to 1.0 exactly — numerator
    equals denominator for a perfect fit)."""
    rows = [
        (i, "P", (datetime.date(1992, 1, 1) + datetime.timedelta(days=t))
         .isoformat(), 100.0 * t + 200.0)
        for i, t in enumerate([0, 1, 2, 3, 10])
    ]
    out = ols_report(ols_daily(_orders(spark, rows))).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_days == 5
    assert r.slope_dollars_per_day == pytest.approx(100.0, abs=1e-6)
    assert r.intercept_dollars == pytest.approx(200.0, abs=1e-6)
    assert r.r2 == 1.0


def test_ols_negative_slope_sign(spark):
    """Round-toward-zero signed ratio: a falling line keeps its exact
    negative slope (the ABS/CASE split never mangles the sign)."""
    rows = [
        (i, "P", (datetime.date(1992, 1, 1) + datetime.timedelta(days=t))
         .isoformat(), 1000.0 - 50.0 * t)
        for i, t in enumerate([0, 1, 2, 4])
    ]
    r = ols_report(ols_daily(_orders(spark, rows))).collect()[0]
    assert r.slope_dollars_per_day == pytest.approx(-50.0, abs=1e-6)
    assert r.r2 == 1.0


def test_holt_linear_recurrence(spark, tmp_path):
    """The integer halving recurrence, by hand (cents):
    x = [100, 200, 300] → l1=100,b1=0; l2=⌊(200+100+0)/2⌋=150,
    b2=⌊(150−100+0)/2⌋=25; l3=⌊(300+150+25)/2⌋=237,
    b3=⌊(237−150+25)/2⌋=56. Forecast = l+b."""
    from locopy_spark.queries.trends import HOLT_START, q_holt_linear

    d0 = datetime.date.fromisoformat(HOLT_START)
    rows = [
        (1, "P", d0.isoformat(), 1.00),
        (2, "P", (d0 + datetime.timedelta(days=1)).isoformat(), 2.00),
        (3, "P", (d0 + datetime.timedelta(days=2)).isoformat(), 3.00),
    ]
    _orders(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = q_holt_linear(spark, str(tmp_path)).collect()
    assert [(r.level, r.trend, r.forecast) for r in out] == [
        (1.00, 0.00, 1.00),
        (1.50, 0.25, 1.75),
        (2.37, 0.56, 2.93),
    ]


def test_theil_sen_outlier_robust(spark, tmp_path):
    """Monthly series 10, 20, 30, 40, 1000000 dollars (one spike):
    slopes of the 10 pairs in $/month include the spike only in 4 of
    10; the median (5th smallest) is still 10 — OLS would be dragged
    to ~165k. Pins both the pair expansion and the rank-select
    median convention."""
    from locopy_spark.queries.trends import q_theil_sen

    rows = []
    for m, v in enumerate([10.0, 20.0, 30.0, 40.0, 1000000.0]):
        d = datetime.date(1992, 1 + m, 15)
        rows.append((m, "P", d.isoformat(), v))
    _orders(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = q_theil_sen(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].n_pairs == 10
    assert out[0].ts_slope_dollars_per_month == pytest.approx(10.0, abs=1e-3)


def test_first_digit_case_boundaries(spark):
    """First-significant-digit extraction at the dangerous spots:
    exact powers of 10 (float log10 could round either way — the CASE
    chain cannot), single digits, and bigint-scale values."""
    vals = [1, 9, 10, 99, 100, 1000, 999999, 10**12, 7 * 10**17, 10**18]
    want = [1, 9, 1, 9, 1, 1, 9, 1, 7, 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long").selectExpr(
        f"{_first_digit_case('v', 'div')} AS d"
    )
    assert [r.d for r in df.collect()] == want


def test_benford_uniform_digits(spark):
    """9 orders with first digits 1..9 exactly once → every obs_ppm is
    111111 (⌊1e6/9⌋) and the chi² matches the hand sum over the
    published expectation constants."""
    rows = [
        (i, "P", "1995-01-01", float(d) * 100.0)  # d00.00 dollars
        for i, d in enumerate(range(1, 10))
    ]
    orders = _orders(spark, rows)
    customer = spark.createDataFrame(
        [(i, "SEG") for i in range(9)], "c_custkey long, c_mktsegment string"
    )
    orders = orders.withColumn("o_custkey", orders.o_orderkey)
    out = benford_report(benford_counts(orders, customer)).collect()
    assert len(out) == 9
    assert all(r.obs_ppm == 111111 for r in out)
    want_chi2 = sum(
        (111111 - e) * (111111 - e) // e for e in BENFORD_PPM.values()
    )
    assert all(r.chi2_ppm == want_chi2 for r in out)
    assert [r.exp_ppm for r in out] == list(BENFORD_PPM.values())


def test_graph_reach_path_graph(spark, tmp_path):
    """Path graph 1-2-3-4-5-6 via chained 2-part orders, seeds = the 3
    smallest nodes (1,2,3): distances {1:0, 2:0, 3:0, 4:1, 5:2, 6:3}
    → histogram [(0,3),(1,1),(2,1),(3,1)]."""
    from locopy_spark.queries.mining import q_graph_reach

    rows = []
    for i, (a, b) in enumerate([(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]):
        rows.append((i, a))
        rows.append((i, b))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = q_graph_reach(spark, str(tmp_path)).collect()
    assert [(r.d, r.n_nodes) for r in out] == [(0, 3), (1, 1), (2, 1), (3, 1)]
    # beyond-broadcast-limit escape hatch: identical histogram
    out2 = q_graph_reach(spark, str(tmp_path), broadcast_frontier=False)
    assert [(r.d, r.n_nodes) for r in out2.collect()] == [
        (0, 3), (1, 1), (2, 1), (3, 1),
    ]


def test_dataset_card_tiny(spark, tmp_path):
    """Hand corpus: source A has 3 docs (two identical after
    normalization → 1 exact dup) with lengths 5, 5, 11 (median 5);
    source B has 1 doc. Token counts are whitespace tokens."""
    from locopy_spark.queries.corpus import p_dataset_card

    docs = [
        (1, "hello world", "en", "A", 11),
        (2, "hi  there", "en", "A", 5),
        (3, "HI THERE", "fr", "A", 5),  # normalizes to "hi there" → dup
        (4, "solo", "en", "B", 4),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in p_dataset_card(spark, str(tmp_path)).collect()}
    a, b = out["A"], out["B"]
    assert (a.n_docs, a.n_langs, a.n_exact_dups) == (3, 2, 1)
    assert a.total_tokens == 6  # 2 + 2 + 2
    assert a.median_chars == 5 and a.avg_chars == pytest.approx(7.0)
    assert (b.n_docs, b.n_langs, b.n_exact_dups, b.total_tokens) == (1, 1, 0, 1)


def test_winsorized_hand_case(spark, tmp_path):
    """Values 1..20 dollars in one group: P5 fence = 1st value (1),
    P95 fence = 19th (19); winsorized mean clips the 20→19 (209/20 =
    10.45), trimmed mean drops it (10.0), raw mean 10.5."""
    from locopy_spark.queries.stats import q_winsorized

    rows = [
        (i, "P", "1995-01-01", float(i)) for i in range(1, 21)
    ]
    _orders(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    r = q_winsorized(spark, str(tmp_path)).collect()[0]
    assert r.n == 20
    assert r.winsor_mean == pytest.approx(10.45)
    assert r.trimmed_mean == pytest.approx(10.0)
    assert r.raw_mean == pytest.approx(10.5)


def test_cms_overestimate_only_and_exact_uncollided(spark, tmp_path):
    """CMS guarantee: est ≥ true for every probe (cells only ever add
    collision mass); with a vocab far below the width, collisions are
    absent and the sketch answers exactly. Known counts: 'alpha'×3,
    'beta'×2, 'gamma'×1."""
    from locopy_spark.queries.corpus import t_cms_counts

    docs = [
        (1, "alpha beta alpha", "en", "A", 16),
        (2, "beta gamma alpha", "en", "A", 16),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.token: r for r in t_cms_counts(spark, str(tmp_path)).collect()}
    assert {t: r.true_c for t, r in out.items()} == {
        "alpha": 3, "beta": 2, "gamma": 1,
    }
    assert all(r.est_c >= r.true_c and r.over >= 0 for r in out.values())
    assert all(r.est_c == r.true_c for r in out.values())  # 3 tokens, w=1024


def test_decile_lift_hand_case(spark, tmp_path):
    """20 orders, values 1..20; the 4 highest-value orders are URGENT.
    Top-decile (values 20,19) response 2/2 vs base rate 4/20 →
    lift 5.0 in decile 1; cum_gain reaches 1.0 by construction at
    decile 2 (urgent mass = values 17-20 = deciles 1-2)."""
    from locopy_spark.queries.stats import q_decile_lift

    rows = [
        (i, "1-URGENT" if i > 16 else "5-LOW", "1995-01-01", float(i))
        for i in range(1, 21)
    ]
    _orders(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r.decile: r for r in q_decile_lift(spark, str(tmp_path)).collect()}
    assert len(out) == 10 and all(out[d].n == 2 for d in out)
    assert out[1].n_pos == 2 and out[1].lift == pytest.approx(5.0)
    assert out[2].n_pos == 2 and out[2].cum_gain == pytest.approx(1.0)
    assert out[3].n_pos == 0 and out[3].cum_gain == pytest.approx(1.0)


def test_holt_winters_hand_case(spark, tmp_path):
    """Period-7 seed by hand (cents): days 1..7 all 700, day 8 = 1400.
    l_7 = 700, b_7 = 0, s_i = 0 for the whole first cycle; day-8 step:
    l = ⌊(1400 − 0 + 700 + 0)/2⌋ = 1050, b = ⌊(1050 − 700 + 0)/2⌋ =
    175, s = ⌊(1400 − 1050 + 0)/2⌋ = 175; forecast for day 9 =
    1050 + 175 + s_2(=0) = 1225."""
    from locopy_spark.queries.trends import HOLT_START, q_holt_winters

    d0 = datetime.date.fromisoformat(HOLT_START)
    rows = [
        (t, "P", (d0 + datetime.timedelta(days=t)).isoformat(),
         7.0 if t < 7 else 14.0)
        for t in range(8)
    ]
    _orders(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = q_holt_winters(spark, str(tmp_path)).collect()
    assert len(out) == 2  # seed row (t=7) + one step
    seed, step = out
    assert (seed.level, seed.trend, seed.season, seed.forecast) == (
        7.0, 0.0, 0.0, 7.0,
    )
    assert (step.revenue, step.level, step.trend, step.season) == (
        14.0, 10.5, 1.75, 1.75,
    )
    assert step.forecast == 12.25


def test_weighted_quantiles_hand_case(spark, tmp_path):
    """Flag A: ($1,w=1) ($2,w=1) ($3,w=2), total weight 4 → weighted
    P25 = 1 (cumw 1 ≥ 1), median = 2 (cumw 2 ≥ 2), P75 = 3 (cumw 4 ≥
    3 first reached at the $3 row, cumw jumps 2→4)."""
    from locopy_spark.queries.stats import q_weighted_quantiles

    rows = [
        (1, 1, "A", 1.0, 1.0),
        (1, 2, "A", 2.0, 1.0),
        (1, 3, "A", 3.0, 2.0),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_returnflag string,"
        " l_extendedprice double, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    r = q_weighted_quantiles(spark, str(tmp_path)).collect()[0]
    assert (r.n_lines, r.total_units) == (3, 4)
    assert (r.wp25, r.wmedian, r.wp75) == (1.0, 2.0, 3.0)


def test_gini_extremes(spark, tmp_path):
    """Segment EQ: four customers with identical revenue → gini 0.
    Segment ONE: one of four customers holds everything → gini =
    (n−1)/n = 0.75 exactly (750,000,000 ppb)."""
    from locopy_spark.queries.stats import q_gini

    cust = [(i, "EQ") for i in range(4)] + [(10 + i, "ONE") for i in range(4)]
    spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [(i, 5.0) for i in range(4)] + [(10, 20.0)]
    spark.createDataFrame(
        orders, "o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.c_mktsegment: r for r in q_gini(spark, str(tmp_path)).collect()}
    assert out["EQ"].gini_ppb == 0 and out["EQ"].n_customers == 4
    assert out["ONE"].gini_ppb == 750000000
    assert out["ONE"].total_revenue == pytest.approx(20.0)


def test_ks_test_hand_case(spark, tmp_path):
    """BUILDING values {1,2}, MACHINERY values {3,4} (disjoint
    supports): D = 1 exactly → d_ppb = 1e9, reject at any n.
    Also pins the signed prefix-sum construction: the gap peaks at
    v=2 with c_A·n_B − c_B·n_A = 2·2 − 0 = 4 = n_A·n_B."""
    from locopy_spark.queries.stats import q_ks_test

    cust = [(1, "BUILDING"), (2, "BUILDING"), (3, "MACHINERY"), (4, "MACHINERY")]
    spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)]
    spark.createDataFrame(
        orders, "o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = q_ks_test(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b, r.d_ppb) == (2, 2, 1000000000)
    assert r.reject_95 == False  # n too small: c·sqrt(4/4) = 1.358 > 1


def test_mann_whitney_hand_case(spark, tmp_path):
    """BUILDING values {1,2}, MACHINERY values {2,3}: pooled ranks
    1, 2.5, 2.5, 4 (one tie pair), so R_A = 3.5 → doubled 7,
    U_A = 3.5 − 3 = 0.5 → doubled 1, T = 2³−2 = 6, and
    z = (0.5 − 2)/sqrt((4/12)·(5 − 6/12)) = −√1.5 exactly."""
    from locopy_spark.queries.stats import q_mann_whitney

    cust = [(1, "BUILDING"), (2, "BUILDING"), (3, "MACHINERY"), (4, "MACHINERY")]
    spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [(1, 1.0), (2, 2.0), (3, 2.0), (4, 3.0)]
    spark.createDataFrame(
        orders, "o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = q_mann_whitney(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b, r.u_a_x2, r.ties_t) == (2, 2, 1, 6)
    assert r.z == pytest.approx(-(1.5 ** 0.5))


def test_spearman_hand_case(spark, tmp_path):
    """x = (1,2,3), y = (1,2,2): doubled ranks x → (2,4,6),
    y → (2,5,5); centered by n+1=4 → cx=(−2,0,2), cy=(−2,1,1);
    Σcxcy=6, Σcx²=8, Σcy²=6 → rho = 6/√48 = √3/2."""
    from locopy_spark.queries.stats import q_spearman

    orders = [(1, 1.0), (2, 2.0), (3, 3.0)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li = [(1,), (2,), (2,), (3,), (3,)]
    spark.createDataFrame(li, "l_orderkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))
    r = q_spearman(spark, str(tmp_path)).collect()[0]
    assert (r.n, r.sxy) == (3, 6)
    assert r.rho == pytest.approx((3 ** 0.5) / 2)


def test_wilcoxon_hand_case(spark, tmp_path):
    """Customer diffs (+1, −2, +3, +3) milli-units: |d| ranks
    1, 2, 3.5, 3.5 (doubled 2,4,7,7), W⁺ = 1+3.5+3.5 = 8 → doubled 16,
    T = 2³−2 = 6, z = (8−5)/√(7.5−0.125) = 3/√7.375."""
    from locopy_spark.queries.stats import q_wilcoxon

    early, late = "1994-06-01", "1996-06-01"
    orders = [
        (1, 1.000, early), (1, 1.001, late),   # d = +1
        (2, 0.002, early),                      # d = -2
        (3, 0.003, late),                       # d = +3
        (4, 1.000, early), (4, 1.003, late),   # d = +3
    ]
    spark.createDataFrame(
        orders, "o_custkey long, o_totalprice double, o_orderdate string"
    ).selectExpr(
        "o_custkey", "o_totalprice", "cast(o_orderdate as date) as o_orderdate"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = q_wilcoxon(spark, str(tmp_path)).collect()[0]
    assert (r.n_pairs, r.w_plus_x2, r.ties_t) == (4, 16, 6)
    assert r.z == pytest.approx(3 / (7.375 ** 0.5))


def test_autocorr_alternating(spark, tmp_path):
    """Daily revenue 1,2,1,2,1,2 on six consecutive days: lag-1
    pairs are perfectly anti-phase (acf = −1), lag-2 perfectly in
    phase (acf = +1)."""
    from locopy_spark.queries.stats import q_autocorr

    days = ["1995-01-0%d" % i for i in range(1, 7)]
    orders = [(d, float(1 + (i % 2))) for i, d in enumerate(days)]
    spark.createDataFrame(
        orders, "o_orderdate string, o_totalprice double"
    ).selectExpr(
        "cast(o_orderdate as date) as o_orderdate", "o_totalprice"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.lag: r for r in q_autocorr(spark, str(tmp_path)).collect()}
    assert (out[1].n, out[2].n) == (5, 4)
    assert out[1].acf == pytest.approx(-1.0)
    assert out[2].acf == pytest.approx(1.0)


def test_runs_test_hand_case(spark, tmp_path):
    """Daily series 5,1,6,2,7: lower median (rank 3 of 5) = 5;
    above-median signs F,F,T,F,T → R = 4 runs, n₁=2, n₂=3;
    μ = 2·2·3/5+1 = 3.4, σ² = 12·(12−5)/(25·4) = 0.84 →
    z = 0.6/√0.84."""
    from locopy_spark.queries.stats import q_runs_test

    days = ["1995-01-0%d" % i for i in range(1, 6)]
    vals = [5.0, 1.0, 6.0, 2.0, 7.0]
    spark.createDataFrame(
        list(zip(days, vals)), "o_orderdate string, o_totalprice double"
    ).selectExpr(
        "cast(o_orderdate as date) as o_orderdate", "o_totalprice"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = q_runs_test(spark, str(tmp_path)).collect()[0]
    assert (r.n_days, r.n_above, r.n_below, r.runs) == (5, 2, 3, 4)
    assert r.z == pytest.approx(0.6 / (0.84 ** 0.5))
