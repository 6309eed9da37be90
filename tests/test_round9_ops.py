"""Independent naive-reference / edge-semantics checks for the round-9
additions.  The DuckDB oracles share each query's closed-form
construction, so these tests re-derive the TEXTBOOK definitions in
plain Python on small hand-built or seeded data — same answers,
independently derived — and pin the edge semantics (tier boundaries,
ordering ties, decision crossings) the gate's real data never hits.
"""

import itertools
import random
from datetime import datetime

SEED = 20260816


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(path / f"{name}.parquet")
    )


def _ts(day, sec=0):
    return datetime(2000, 1, 1 + day, 0, 0, sec)


# -- Shapley vs permutation brute force --------------------------------------------


def test_shapley_matches_permutation_bruteforce(spark, tmp_path):
    """φ·k! from the closed-form lattice sum equals the definitional
    average over ALL k! channel orderings, on users with adversarial
    touch patterns (touch after purchase, empty mask, full mask)."""
    from locopy_spark.queries.events_ext import (
        SHAPLEY_CHANNELS,
        q_attribution_shapley,
    )

    k = len(SHAPLEY_CHANNELS)
    rows, eid = [], 0

    def ev(uid, typ, day):
        nonlocal eid
        eid += 1
        rows.append((eid, _ts(day), uid, typ, 1.0, "{}"))

    r = random.Random(SEED)
    masks = {}
    convs = {}
    for uid in range(60):
        touched = [ch for ch in SHAPLEY_CHANNELS if r.random() < 0.5]
        conv = r.random() < 0.4
        pday = 10
        mask = 0
        for ch in touched:
            before = r.random() < 0.7
            day = r.randrange(1, pday) if before else pday + r.randrange(1, 5)
            ev(uid, ch, day)
            if conv and before:
                mask |= 1 << SHAPLEY_CHANNELS.index(ch)
            elif not conv:
                mask |= 1 << SHAPLEY_CHANNELS.index(ch)
        if conv:
            ev(uid, "purchase", pday)
        masks[uid] = mask
        convs[uid] = conv
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )

    def v(S):
        return sum(
            1 for uid in masks if convs[uid] and (masks[uid] | S) == S
        )

    # definitional Shapley: average marginal over all k! orderings
    phi = {ch: 0 for ch in SHAPLEY_CHANNELS}
    for perm in itertools.permutations(range(k)):
        S = 0
        for i in perm:
            phi[SHAPLEY_CHANNELS[i]] += v(S | (1 << i)) - v(S)
            S |= 1 << i
    got = {
        r_.channel: r_.phi_x24
        for r_ in q_attribution_shapley(spark, str(tmp_path)).collect()
    }
    assert got == phi
    # efficiency: Σφ·k! = k!·(v(full) − v(∅))
    assert sum(phi.values()) == 24 * (v((1 << k) - 1) - v(0))


# -- CUPED recovers an exactly-linear covariate ------------------------------------


def test_cuped_recovers_exact_linear_covariate(spark, tmp_path):
    """If post = 2·pre + variant-shift exactly, θ must be exactly 2.0
    and the CUPED diff must equal the constructed shift (variance
    fully removed — the definitional promise of the adjustment)."""
    from locopy_spark.queries.trends import CUPED_POST_Y, CUPED_PRE_Y, q_cuped

    rows = []
    shift = 7.0
    r = random.Random(SEED)
    # MIRRORED pre-values across arms (customers 2i and 2i+1 share a
    # pre) so the shift is exactly uncorrelated with the covariate —
    # the integer identity cov_n = 2·varp_n then holds bit-for-bit
    for i in range(20):
        pre = float(r.randrange(10, 500))
        for cust, s in ((2 * i, 0.0), (2 * i + 1, shift)):
            rows.append((cust, datetime(CUPED_PRE_Y, 6, 1), pre))
            rows.append(
                (cust, datetime(CUPED_POST_Y, 6, 1), 2.0 * pre + s)
            )
    _write(
        spark, tmp_path, "orders", rows,
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    got = q_cuped(spark, str(tmp_path)).collect()[0]
    assert got.theta == 2.0
    # cents: the shift is 7.0 dollars = 7000 cents at SCALE=1000
    assert abs(got.cuped_diff - 7000.0) < 1e-6
    assert got.var_reduction < 1.0


# -- Bass normal equations vs exact Python fractions --------------------------------


def test_bass_moments_match_python_bruteforce(spark, tmp_path):
    """The Cramer solution over the exact power sums equals the same
    IEEE formula evaluated in Python over independently-accumulated
    integer sums (seeded adoption curve with gap weeks)."""
    from locopy_spark.queries.timeseries import q_bass_diffusion

    r = random.Random(SEED)
    rows, cust = [], 0
    week0 = datetime(1995, 1, 4)  # a Wednesday; week index arbitrary
    adopters_by_week = {}
    for w in range(0, 30):
        if w in (7, 19):  # gap weeks
            continue
        n = r.randrange(1, 12)
        adopters_by_week[w] = n
        for _ in range(n):
            day = w * 7 + r.randrange(7)
            rows.append(
                (cust, datetime.fromordinal(week0.toordinal() + day), 100.0)
            )
            # later repeat orders must NOT create new adopters
            rows.append(
                (cust, datetime.fromordinal(week0.toordinal() + day + 40), 50.0)
            )
            cust += 1
    _write(
        spark, tmp_path, "orders", rows,
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    got = q_bass_diffusion(spark, str(tmp_path)).collect()[0]
    # independent accumulation: epoch week of each adopter's FIRST day
    firsts = {}
    for (ck, d, _v) in rows:
        wi = (d.toordinal() - datetime(1970, 1, 1).toordinal()) // 7
        firsts[ck] = min(firsts.get(ck, 10**9), wi)
    grid = {}
    for wi in firsts.values():
        grid[wi] = grid.get(wi, 0) + 1
    lo, hi = min(grid), max(grid)
    c = 0
    s0 = s1 = s2 = s3 = s4 = sy = sxy = sx2y = 0
    for wi in range(lo, hi + 1):
        n_t = grid.get(wi, 0)
        s0 += 1
        s1 += c
        s2 += c * c
        s3 += c**3
        s4 += c**4
        sy += n_t
        sxy += c * n_t
        sx2y += c * c * n_t
        c += n_t
    det = (float(s0) * (float(s2) * float(s4) - float(s3) * float(s3))
           - float(s1) * (float(s1) * float(s4) - float(s3) * float(s2))
           + float(s2) * (float(s1) * float(s3) - float(s2) * float(s2)))
    det_a = (float(sy) * (float(s2) * float(s4) - float(s3) * float(s3))
             - float(s1) * (float(sxy) * float(s4) - float(s3) * float(sx2y))
             + float(s2) * (float(sxy) * float(s3) - float(s2) * float(sx2y)))
    assert got.n_weeks == hi - lo + 1
    assert got.total_adopters == cust
    assert got.coef_a == det_a / det


# -- SPRT decision crossing ---------------------------------------------------------


def test_sprt_decision_crossing(spark, tmp_path):
    """A constructed run of all-converting days must cross the upper
    Wald bound at the EXACT day the integer cumulative LLR reaches it
    (accept_h1), and low-conversion days walk it back down."""
    from locopy_spark.queries.trends import (
        SPRT_A_PPB,
        SPRT_B_PPB,
        SPRT_UP_PPB,
        q_sprt,
    )

    rows, eid = [], 0

    def ev(uid, typ, day):
        nonlocal eid
        eid += 1
        rows.append((eid, _ts(day), uid, typ, 1.0, "{}"))

    # variant arm = odd user ids; 3 users/day all converting
    uid = 1
    for day in range(12):
        for _ in range(3):
            ev(uid, "view", day)
            ev(uid, "purchase", day)
            uid += 2
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = q_sprt(spark, str(tmp_path)).collect()
    cum = 0
    for row in got:
        assert (row.n_users, row.n_conv) == (3, 3)
        cum += 3 * SPRT_A_PPB + 0 * SPRT_B_PPB
        assert row.cum_llr_ppb == cum
        want = "accept_h1" if cum >= SPRT_UP_PPB else "continue"
        assert row.decision == want
    # the bound IS crossed inside the constructed horizon
    assert got[-1].decision == "accept_h1"
    assert any(r.decision == "continue" for r in got)


# -- loyalty tier boundaries --------------------------------------------------------


def test_loyalty_tier_boundaries(spark, tmp_path):
    """Tier rule boundaries: 1 order = one-time, 3 = repeat (upper
    edge), 4 = loyal (lower edge), absent year = none; revenue flows
    land in the right cells."""
    from locopy_spark.queries.tpch_ext import LOY_Y1, LOY_Y2, q_loyalty_migration

    rows = []

    def order(cust, year, n, price=10.0):
        for i in range(n):
            rows.append((cust, datetime(year, 3, 1 + i), price))

    order(1, LOY_Y1, 1)            # one-time -> none
    order(2, LOY_Y1, 3)            # repeat (upper edge) ...
    order(2, LOY_Y2, 4)            # ... -> loyal (lower edge)
    order(3, LOY_Y2, 2)            # none -> repeat (new customer)
    _write(
        spark, tmp_path, "orders", rows,
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    got = {
        (r.tier_from, r.tier_to): (r.n_customers, r.rev_from_c, r.rev_to_c)
        for r in q_loyalty_migration(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("one-time", "none"): (1, 10000, 0),
        ("repeat", "loyal"): (1, 30000, 40000),
        ("none", "repeat"): (1, 0, 20000),
    }


# -- NDR hand computation -----------------------------------------------------------


def test_ndr_hand_computed(spark, tmp_path):
    """Three customers, two year pairs: expansion, churn, and a new
    customer who must NOT enter the earlier cohort's base."""
    from locopy_spark.queries.timeseries import q_ndr

    rows = [
        (1, datetime(1996, 1, 1), 100.0),   # expands to 150
        (1, datetime(1997, 1, 1), 150.0),
        (2, datetime(1996, 1, 1), 50.0),    # churns
        (3, datetime(1997, 1, 1), 40.0),    # new in 1997; churns by 1998
        (4, datetime(1998, 1, 1), 70.0),    # only in final year
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_custkey long, o_orderdate timestamp, o_totalprice double",
    )
    got = {r.yr: r for r in q_ndr(spark, str(tmp_path)).collect()}
    assert set(got) == {1996, 1997}  # 1998 is the horizon year
    g96 = got[1996]
    assert (g96.n_base, g96.n_retained) == (2, 1)
    assert (g96.rev_base_c, g96.rev_next_c) == (150000, 150000)
    assert g96.ndr_ppm == 1000000
    assert g96.logo_ppm == 500000
    g97 = got[1997]
    assert (g97.n_base, g97.n_retained) == (2, 0)
    assert g97.ndr_ppm == 0


# -- funnel ordering edges ----------------------------------------------------------


def test_funnel_sig_ordering_edges(spark, tmp_path):
    """A click BEFORE the first view must not count as a view→click
    conversion, and an equal-timestamp pair is NOT strictly ordered;
    counts are hand-verified per variant."""
    from locopy_spark.queries.events_ext import q_funnel_sig

    rows, eid = [], 0

    def ev(uid, typ, day, sec=0):
        nonlocal eid
        eid += 1
        rows.append((eid, _ts(day, sec), uid, typ, 1.0, "{}"))

    # variant 0 (even ids)
    ev(2, "view", 1); ev(2, "click", 2); ev(2, "purchase", 3)  # full funnel
    ev(4, "click", 1); ev(4, "view", 2)                        # click first
    ev(6, "view", 1, 30); ev(6, "click", 1, 30)                # tied ts
    # variant 1 (odd ids)
    ev(1, "view", 1); ev(1, "click", 2)                        # stops at click
    ev(3, "view", 1)                                            # view only
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r.transition: r for r in q_funnel_sig(spark, str(tmp_path)).collect()
    }
    vc = got["view->click"]
    assert (vc.n0, vc.c0, vc.n1, vc.c1) == (3, 1, 2, 1)
    cp = got["click->purchase"]
    assert (cp.n0, cp.c0, cp.n1, cp.c1) == (1, 1, 1, 0)


# -- post-hoc panel consistency -----------------------------------------------------


def test_posthoc_pairs_decisions(spark, tmp_path):
    """A pair with a massive constructed mean gap must reject and the
    identical-distribution pair must not; z signs follow the (g_a,
    g_b) order convention."""
    from locopy_spark.queries.stats import ANOVA_GROUPS, q_posthoc_pairs

    r = random.Random(SEED)
    rows = []
    means = {g: 100.0 for g in ANOVA_GROUPS}
    means[ANOVA_GROUPS[0]] = 5000.0  # 1-URGENT far above the rest
    for g in ANOVA_GROUPS:
        for _ in range(200):
            rows.append((g, means[g] + r.randrange(-20, 21)))
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderpriority string, o_totalprice double",
    )
    got = {
        (r_.g_a, r_.g_b): r_ for r_ in q_posthoc_pairs(spark, str(tmp_path)).collect()
    }
    assert len(got) == 10
    big = got[(ANOVA_GROUPS[0], ANOVA_GROUPS[1])]
    assert big.reject_bonf and big.z_pair > 0
    flat = got[(ANOVA_GROUPS[2], ANOVA_GROUPS[3])]
    assert not flat.reject_bonf
