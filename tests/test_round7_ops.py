"""Independent naive-reference checks for the round-7 operators:
q_nelson_aalen, q_lorenz_curve, q_anova, s_mrr_eval,
q_markov_stationary. Each compares the Spark query against a
brute-force Python implementation of the textbook definition on seeded
synthetic data (same answers, independently derived — the DuckDB
oracles share each query's construction, so a bug IN the construction
needs this second line of defense)."""

import datetime as dt
import random

import pytest

SEED = 1907


def _rng():
    return random.Random(SEED)


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(path / f"{name}.parquet")
    )


def test_nelson_aalen_vs_naive_sum(spark, tmp_path):
    """haz_ppb = ⌊d·1e9/n⌋ and cumhaz_ppb = its running sum, against a
    brute-force at-risk sweep on the same synthetic spans the KM naive
    test uses (the two estimators share one scaffolding)."""
    from locopy_spark.queries.assoc import KM_CHURN_DAYS, q_nelson_aalen

    r = _rng()
    base = dt.date(1995, 1, 1)
    horizon = base + dt.timedelta(days=400)
    orders, lives = [], []
    for i in range(200):
        first = r.randrange(0, 300)
        span = r.randrange(0, 80)
        orders.append((i, base + dt.timedelta(days=first)))
        orders.append((i, base + dt.timedelta(days=first + span)))
        lives.append((span, first + span))
    orders.append((10**6, horizon))
    lives.append((0, 400))
    _write(spark, tmp_path, "orders", orders,
           "o_custkey long, o_orderdate date")
    rows = q_nelson_aalen(spark, str(tmp_path)).collect()
    events = [(t, int(400 - last > KM_CHURN_DAYS)) for t, last in lives]
    times = sorted({t for t, _ in events})
    cum = 0
    by_t = {}
    for t in times:
        n_risk = sum(1 for tt, _ in events if tt >= t)
        d = sum(1 for tt, ev in events if tt == t and ev)
        h = d * 10**9 // n_risk
        cum += h
        by_t[t] = (n_risk, d, h, cum)
    assert [r_.t for r_ in rows] == times
    for r_ in rows:
        n_risk, d, h, cum = by_t[r_.t]
        assert (r_.n_risk, r_.d_events) == (n_risk, d)
        assert r_.haz_ppb == h
        assert r_.cumhaz_ppb == cum
        assert r_.cumhaz == pytest.approx(cum / 1e9)


def test_lorenz_vs_naive_sweep(spark, tmp_path):
    """Decile revenue and cumulative ppm share equal a direct
    sorted-sweep with Python bigints (orderless customers at zero)."""
    from locopy_spark.functions.numeric import SCALE
    from locopy_spark.queries.stats import q_lorenz_curve

    r = _rng()
    segs = ["BUILDING", "MACHINERY"]
    cust, orders = [], []
    by_seg = {s: [] for s in segs}
    for i in range(137):  # non-multiple of 10: uneven decile sizes
        seg = segs[i % 2]
        cust.append((i, seg))
        rev = 0
        for _ in range(r.randrange(0, 4)):
            v = r.randrange(1, 500)
            orders.append((i, v / 10.0))
            rev += round(v / 10.0 * SCALE)
        by_seg[seg].append((rev, i))
    _write(spark, tmp_path, "customer", cust,
           "c_custkey long, c_mktsegment string")
    _write(spark, tmp_path, "orders", orders,
           "o_custkey long, o_totalprice double")
    out = [
        (r_.c_mktsegment, r_.decile, r_.n_customers, r_.decile_revenue,
         r_.cum_share_ppm)
        for r_ in q_lorenz_curve(spark, str(tmp_path)).collect()
    ]
    want = []
    for seg in segs:
        xs = sorted(by_seg[seg])  # ascending (revenue, custkey)
        n = len(xs)
        tot = sum(x for x, _ in xs)
        dec = {}
        for i, (x, _) in enumerate(xs):
            dec.setdefault(i * 10 // n + 1, []).append(x)
        cum = 0
        for d in sorted(dec):
            cum += sum(dec[d])
            want.append(
                (seg, d, len(dec[d]), sum(dec[d]) / SCALE,
                 cum * 10**6 // max(tot, 1))
            )
    assert out == want


def test_anova_vs_textbook(spark, tmp_path):
    """F equals the textbook between/within mean-square ratio computed
    with exact Python ints closed in the same fixed term order."""
    from locopy_spark.queries.stats import ANOVA_GROUPS, q_anova

    r = _rng()
    orders = []
    groups = {g: [] for g in ANOVA_GROUPS}
    for i in range(300):
        g = ANOVA_GROUPS[i % len(ANOVA_GROUPS)]
        v = r.randrange(100, 5000) + (len(g) * 17)  # group-shifted means
        orders.append((g, float(v)))
        groups[g].append(v)
    _write(spark, tmp_path, "orders", orders,
           "o_orderpriority string, o_totalprice double")
    row = q_anova(spark, str(tmp_path)).collect()[0]
    n = sum(len(v) for v in groups.values())
    k = sum(1 for v in groups.values() if v)
    sq = sum(x * x for v in groups.values() for x in v)
    # same fixed order as the query: group terms left-to-right
    sb = 0.0
    for g in ANOVA_GROUPS:
        v = groups[g]
        if v:
            sb += (float(sum(v)) / len(v)) * float(sum(v))
    s = sum(float(sum(groups[g])) for g in ANOVA_GROUPS)
    ssb = sb - (s / n) * s
    ssw = (float(sq) - (s / n) * s) - ssb
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (row.n, row.k) == (n, k)
    assert row.ssb == pytest.approx(ssb, rel=1e-12)
    assert row.ssw == pytest.approx(ssw, rel=1e-12)
    assert row.f_stat == pytest.approx(f, rel=1e-12)


def test_mrr_eval_vs_bruteforce(spark, tmp_path):
    """nn_rank equals a brute-force Python replay: exact top-1 by
    fixed-point cosine, then the rank of that neighbor under the
    int8-quantized proxy ordering (ties by id)."""
    import math

    from locopy_spark.functions.vectors import FIXED_SCALE
    from locopy_spark.queries.docs import KNN_QUERY_IDS
    from locopy_spark.queries.docs_ext import s_mrr_eval

    r = _rng()
    dim, nvec = 8, 60
    vecs = {
        i: [r.uniform(-1, 1) for _ in range(dim)] for i in range(nvec)
    }
    _write(
        spark, tmp_path, "embeddings",
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    # replicate the float32 storage round-trip
    import numpy as np

    v32 = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}

    def fdot(a, b):
        return sum(
            math.floor(x * y * FIXED_SCALE + 0.5) for x, y in zip(a, b)
        )

    def codes(v):
        amax = max(abs(x) for x in v)
        return [math.floor(x / amax * 127 + 0.5) for x in v]

    def cos(dot, na, nb):
        return float(dot) / math.sqrt(float(na) * float(nb))

    want = {}
    for q in KNN_QUERY_IDS:
        exact = sorted(
            (
                (-cos(fdot(v32[q], v32[n]), fdot(v32[q], v32[q]),
                      fdot(v32[n], v32[n])), n)
                for n in vecs if n != q
            )
        )
        true_nn = exact[0][1]
        qc, qn = codes(v32[q]), None
        qn = sum(c * c for c in qc)
        prox = {
            n: cos(sum(x * y for x, y in zip(codes(v32[n]), qc)),
                   qn, sum(c * c for c in codes(v32[n])))
            for n in vecs if n != q
        }
        t_pc = prox[true_nn]
        rank = 1 + sum(
            1
            for n, pc in prox.items()
            if pc > t_pc or (pc == t_pc and n < true_nn)
        )
        want[q] = (true_nn, rank)
    rows = s_mrr_eval(spark, str(tmp_path)).collect()
    assert [r_.query_id for r_ in rows] == sorted(KNN_QUERY_IDS)
    for r_ in rows:
        true_nn, rank = want[r_.query_id]
        assert (r_.true_nn, r_.nn_rank) == (true_nn, rank), r_.query_id
        assert r_.rr_ppm == 10**6 // rank
        assert r_.hit_at_5 == int(rank <= 5)


def test_markov_stationary_vs_naive_power(spark, tmp_path):
    """pi_ppb equals 12 rounds of the integer power method replayed
    with Python bigints on the brute-force transition counts."""
    from locopy_spark.queries.events_ext import MS_ITERS, q_markov_stationary

    r = _rng()
    types = ["a", "b", "c", "d"]
    base = dt.datetime(2024, 1, 1)
    rows, seqs = [], {}
    eid = 0
    for u in range(40):
        seq = [types[r.randrange(4)] for _ in range(r.randrange(1, 12))]
        seqs[u] = seq
        for j, t in enumerate(seq):
            rows.append((eid, u, t, base + dt.timedelta(seconds=eid)))
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, user_id long, event_type string, ts timestamp_ntz",
    )
    trans = {}
    for seq in seqs.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    n_from = {}
    for (a, _), n in trans.items():
        n_from[a] = n_from.get(a, 0) + n
    tys = sorted({a for a, _ in trans} | {b for _, b in trans})
    pi = {t: 10**9 // len(tys) for t in tys}
    for _ in range(MS_ITERS):
        nxt = {t: 0 for t in tys}
        for (a, b), n in trans.items():
            nxt[b] += pi[a] * n // n_from[a]
        pi = nxt
    got = {
        r_.event_type: r_.pi_ppb
        for r_ in q_markov_stationary(spark, str(tmp_path)).collect()
    }
    assert got == pi


def test_centroid_assign_vs_naive(spark, tmp_path):
    """Confusion cells equal a brute-force Python replay: quantize,
    average, quantize centroids, score, argmax with (score desc,
    clabel asc) ties."""
    import math

    import numpy as np

    from locopy_spark.queries.docs_ext import (
        PURITY_V_SCALE,
        s_centroid_assign,
    )

    r = _rng()
    dim, nvec, nlab = 8, 80, 3
    vecs = {}
    rows = []
    for i in range(nvec):
        lab = i % nlab
        v = [float(np.float32(r.uniform(-1, 1) + 0.3 * lab)) for _ in range(dim)]
        vecs[i] = (lab, v)
        rows.append((i, lab, v))
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id long, label int, embedding array<float>")
    # EMB_DIM is baked into the oracle only; the Spark query reads the
    # actual array length, so a dim-8 synthetic table works here
    qv = {
        i: [math.floor(x * PURITY_V_SCALE + 0.5) for x in v]
        for i, (_, v) in enumerate(vecs.values())
    }

    def sgn_ratio(a, b):
        q, rm = divmod(abs(a), b)
        return q if a >= 0 else -q  # truncation toward zero

    cents = {}
    for lab in range(nlab):
        members = [qv[i] for i, (l, _) in vecs.items() if l == lab]
        n = len(members)
        cents[lab] = [
            sgn_ratio(sum(m[d] for m in members), n * 10) for d in range(dim)
        ]
    n2 = {lab: sum(c * c for c in cents[lab]) for lab in cents}
    cells = {}
    for i, (lab, _) in vecs.items():
        best = None
        for cl in range(nlab):
            dot = sum(x * c for x, c in zip(qv[i], cents[cl]))
            score = float(dot) / math.sqrt(float(n2[cl]))
            key = (score, -cl)
            if best is None or key > best[0]:
                best = (key, cl)
        cells[(lab, best[1])] = cells.get((lab, best[1]), 0) + 1
    got = {
        (r_.label, r_.assigned): (r_.n_vecs, r_.share_ppm)
        for r_ in s_centroid_assign(spark, str(tmp_path)).collect()
    }
    row_tot = {}
    for (lab, _), n in cells.items():
        row_tot[lab] = row_tot.get(lab, 0) + n
    want = {
        k: (n, n * 10**6 // row_tot[k[0]]) for k, n in cells.items()
    }
    assert got == want


def test_backlog_aging_vs_naive(spark, tmp_path):
    """Bands/counts/value equal a direct Python sweep with the pinned
    horizon = max orderdate."""
    from locopy_spark.functions.numeric import SCALE
    from locopy_spark.queries.tpch_ext import BACKLOG_BAND_DAYS, q_backlog_aging

    r = _rng()
    base = dt.date(1994, 1, 1)
    rows, naive = [], {}
    horizon = 700
    for i in range(250):
        status = "OFP"[r.randrange(3)]
        day = r.randrange(0, horizon + 1)
        price = r.randrange(100, 99999) / 100.0
        rows.append((i, status, base + dt.timedelta(days=day), price))
    rows.append((10**6, "F", base + dt.timedelta(days=horizon), 1.0))
    for i, status, d, price in rows:
        if status == "F":
            continue
        band = (horizon - (d - base).days) // BACKLOG_BAND_DAYS
        n, v = naive.get((status, band), (0, 0))
        naive[(status, band)] = (n + 1, v + round(price * SCALE))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_orderstatus string, o_orderdate date,"
           " o_totalprice double")
    got = {
        (r_.o_orderstatus, r_.age_band): (r_.n_orders, r_.open_value)
        for r_ in q_backlog_aging(spark, str(tmp_path)).collect()
    }
    want = {k: (n, v / SCALE) for k, (n, v) in naive.items()}
    assert got == want


def test_fulfillment_lag_vs_naive(spark, tmp_path):
    """Per-priority lag histogram equals a direct min-shipdate sweep."""
    from locopy_spark.queries.tpch_ext import q_fulfillment_lag

    r = _rng()
    base = dt.date(1994, 1, 1)
    orders, lines = [], []
    naive = {}
    for i in range(200):
        pri = f"{1 + i % 3}-P"
        oday = r.randrange(0, 300)
        orders.append((i, pri, base + dt.timedelta(days=oday)))
        ships = [oday + r.randrange(1, 60) for _ in range(r.randrange(1, 4))]
        for s in ships:
            lines.append((i, base + dt.timedelta(days=s)))
        lag = min(ships) - oday
        naive[(pri, lag)] = naive.get((pri, lag), 0) + 1
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_orderpriority string, o_orderdate date")
    _write(spark, tmp_path, "lineitem", lines,
           "l_orderkey long, l_shipdate date")
    tot = {}
    for (pri, _), n in naive.items():
        tot[pri] = tot.get(pri, 0) + n
    got = {
        (r_.o_orderpriority, r_.lag_days): (r_.n_orders, r_.share_ppm)
        for r_ in q_fulfillment_lag(spark, str(tmp_path)).collect()
    }
    want = {k: (n, n * 10**6 // tot[k[0]]) for k, n in naive.items()}
    assert got == want


def test_vocab_growth_vs_naive(spark, tmp_path):
    """Checkpoint boundaries, cumulative tokens, and vocabulary equal
    a direct Python sweep in doc-id order."""
    from locopy_spark.queries.corpus import VG_CHECKPOINTS, t_vocab_growth

    r = _rng()
    words = [f"w{j}" for j in range(60)]
    rows, seq = [], []
    for i in range(83):  # non-multiple of 10
        toks = [words[r.randrange(len(words))] for _ in range(r.randrange(1, 15))]
        rows.append((i, " ".join(toks), "en", "s", len(" ".join(toks))))
        seq.append((i, toks))
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars int")
    n = len(seq)
    seq.sort()
    want = []
    for c in range(1, VG_CHECKPOINTS + 1):
        b = c * n // VG_CHECKPOINTS
        toks_cum = sum(len(t) for _, t in seq[:b])
        vocab = len({w for _, t in seq[:b] for w in t})
        want.append((c, b, toks_cum, vocab))
    got = [
        (r_.checkpoint, r_.n_docs, r_.n_tokens, r_.vocab)
        for r_ in t_vocab_growth(spark, str(tmp_path)).collect()
    ]
    assert got == want


def test_peak_days_vs_naive(spark, tmp_path):
    """Peaks equal a direct neighbor sweep with the exact integer
    prominence comparison."""
    from locopy_spark.functions.numeric import SCALE
    from locopy_spark.queries.timeseries import PEAK_PROM_PCT, q_peak_days

    r = _rng()
    base = dt.date(1997, 1, 1)
    daily = {}
    rows = []
    oid = 0
    for d in range(120):
        if r.random() < 0.1:
            continue  # calendar gaps: neighbors are observed days
        for _ in range(r.randrange(1, 5)):
            v = r.randrange(100, 400000) / 100.0
            rows.append((oid, base + dt.timedelta(days=d), v))
            oid += 1
            key = (base + dt.timedelta(days=d) - dt.date(1970, 1, 1)).days
            daily[key] = daily.get(key, 0) + round(v * SCALE)
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_orderdate date, o_totalprice double")
    days = sorted(daily)
    want = []
    for i in range(1, len(days) - 1):
        d, p, nx = days[i], days[i - 1], days[i + 1]
        if (daily[d] * 100 > PEAK_PROM_PCT * daily[p]
                and daily[d] * 100 > PEAK_PROM_PCT * daily[nx]):
            want.append(
                (d, daily[d] / SCALE,
                 daily[d] * 10**6 // daily[p],
                 daily[d] * 10**6 // daily[nx])
            )
    got = [
        (r_.day, r_.revenue, r_.vs_prev_ppm, r_.vs_next_ppm)
        for r_ in q_peak_days(spark, str(tmp_path)).collect()
    ]
    assert got == want


def test_seasonal_strength_vs_textbook(spark, tmp_path):
    """eta² equals the textbook SSB/SST over DOW groups computed with
    Python ints/floats in the same fixed term order."""
    from locopy_spark.functions.numeric import SCALE
    from locopy_spark.queries.stats import q_seasonal_strength

    r = _rng()
    base = dt.date(1998, 1, 6)
    rows, daily = [], {}
    oid = 0
    for d in range(140):
        # strong weekend lift so eta2 is decidedly non-zero
        lift = 3 if (d + 2) % 7 in (0, 6) else 1
        for _ in range(r.randrange(1, 4) * lift):
            v = r.randrange(1000, 300000) / 100.0
            rows.append((oid, base + dt.timedelta(days=d), v))
            oid += 1
            k = (base + dt.timedelta(days=d) - dt.date(1970, 1, 1)).days
            daily[k] = daily.get(k, 0) + round(v * SCALE)
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_orderdate date, o_totalprice double")
    row = q_seasonal_strength(spark, str(tmp_path)).collect()[0]
    groups = {i: [] for i in range(7)}
    for day, v in daily.items():
        groups[(day + 4) % 7].append(v)
    n = len(daily)
    sq = sum(v * v for v in daily.values())
    sb = 0.0
    for i in range(7):
        g = groups[i]
        if g:
            sb += (float(sum(g)) / len(g)) * float(sum(g))
    s = sum(float(sum(groups[i])) for i in range(7))
    ssb = sb - (s / n) * s
    sst = float(sq) - (s / n) * s
    assert row.n_days == n
    assert row.ssb == pytest.approx(ssb, rel=1e-12)
    assert row.sst == pytest.approx(sst, rel=1e-12)
    assert row.eta2 == pytest.approx(ssb / sst, rel=1e-12)
    assert row.eta2 > 0.3  # the injected weekend lift is visible


def test_silhouette_vs_naive_including_negative(spark, tmp_path):
    """Per-label mean simplified silhouette (squared distances, exact
    ppm with round-toward-zero signs) equals a Python replay — on data
    engineered so one label's vectors sit INSIDE another's region,
    forcing negative silhouettes through the signed-ratio path."""
    import math

    import numpy as np

    from locopy_spark.queries.docs_ext import PURITY_V_SCALE, s_silhouette

    r = _rng()
    dim = 8
    rows = []
    vecs = {}
    vid = 0
    # label 0: tight cluster at +1; label 1: tight cluster at -1;
    # label 2: sprinkled INSIDE label 0's region -> negative sil
    for lab, center, n in ((0, 1.0, 25), (1, -1.0, 25), (2, 1.0, 12)):
        for _ in range(n):
            v = [float(np.float32(center + r.uniform(-0.05, 0.05)))
                 for _ in range(dim)]
            vecs[vid] = (lab, v)
            rows.append((vid, lab, v))
            vid += 1
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id long, label int, embedding array<float>")
    qv = {i: [math.floor(x * PURITY_V_SCALE + 0.5) for x in v]
          for i, (_, v) in vecs.items()}

    def tz(num, den):  # round-toward-zero
        q = abs(num) // den
        return q if num >= 0 else -q

    labs = sorted({l for l, _ in vecs.values()})
    cents = {}
    for lab in labs:
        mem = [qv[i] for i, (l, _) in vecs.items() if l == lab]
        cents[lab] = [tz(sum(m[d] for m in mem), len(mem))
                      for d in range(dim)]
    per_label = {}
    for i, (lab, _) in vecs.items():
        d2 = {cl: sum((x - c) ** 2 for x, c in zip(qv[i], cents[cl]))
              for cl in labs}
        a2 = d2[lab]
        b2 = min(v for cl, v in d2.items() if cl != lab)
        sil = tz((b2 - a2) * 10**6, max(max(a2, b2), 1))
        per_label.setdefault(lab, []).append(sil)
    want = {
        lab: (len(v), tz(sum(v), len(v))) for lab, v in per_label.items()
    }
    assert any(s < 0 for s in per_label[2]), "test data must force negatives"
    got = {
        r_.label: (r_.n_vecs, r_.mean_sil_ppm)
        for r_ in s_silhouette(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_value_migration_vs_naive(spark, tmp_path):
    """Transition cells and row shares equal a Python replay of the
    within-year decile assignment and adjacent-year join."""
    from locopy_spark.functions.numeric import SCALE
    from locopy_spark.queries.tpch_ext import q_value_migration

    r = _rng()
    rows = []
    rev = {}
    for cust in range(90):
        for yr in (1995, 1996, 1997):
            if r.random() < 0.3:
                continue  # inactive year: drops out of that matrix
            for _ in range(r.randrange(1, 4)):
                v = r.randrange(100, 80000) / 100.0
                rows.append((cust, dt.date(yr, 1 + r.randrange(12), 5), v))
                rev[(cust, yr)] = rev.get((cust, yr), 0) + round(v * SCALE)
    _write(spark, tmp_path, "orders", rows,
           "o_custkey long, o_orderdate date, o_totalprice double")
    dec = {}
    for yr in (1995, 1996, 1997):
        members = sorted(
            (v, c) for (c, y), v in rev.items() if y == yr
        )
        n = len(members)
        for i, (_, c) in enumerate(members):
            dec[(c, yr)] = i * 10 // n + 1
    cells = {}
    for (c, yr), d_from in dec.items():
        d_to = dec.get((c, yr + 1))
        if d_to is not None:
            k = (yr, d_from, d_to)
            cells[k] = cells.get(k, 0) + 1
    tot = {}
    for (yr, df_, _), n in cells.items():
        tot[(yr, df_)] = tot.get((yr, df_), 0) + n
    want = {
        k: (n, n * 10**6 // tot[(k[0], k[1])]) for k, n in cells.items()
    }
    got = {
        (r_.year_from, r_.dec_from, r_.dec_to): (r_.n_customers, r_.share_ppm)
        for r_ in q_value_migration(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_street_vs_list_vs_naive(spark, tmp_path):
    """Deviation bands and shares equal a Python replay of the
    rounded-unit-price / list-price ppm pipeline."""
    import math

    from locopy_spark.queries.tpch_ext import (
        SVL_BAND_PPM,
        SVL_MAX_BAND,
        q_street_vs_list,
    )

    r = _rng()
    parts, lines = [], []
    cells = {}
    for pk in range(40):
        brand = f"B{pk % 3}"
        retail = r.randrange(1000, 90000) / 100.0
        parts.append((pk, brand, retail))
        for _ in range(r.randrange(1, 5)):
            qty = r.randrange(1, 9)
            ext = round(qty * retail * r.uniform(0.4, 1.6), 2)
            lines.append((pk, float(qty), ext))
            u_c = math.floor(ext / qty * 100 + 0.5)
            ret_c = math.floor(retail * 100 + 0.5)
            band = min(u_c * 10**6 // ret_c // SVL_BAND_PPM, SVL_MAX_BAND)
            cells[(brand, band)] = cells.get((brand, band), 0) + 1
    _write(spark, tmp_path, "part", parts,
           "p_partkey long, p_brand string, p_retailprice double")
    _write(spark, tmp_path, "lineitem", lines,
           "l_partkey long, l_quantity double, l_extendedprice double")
    tot = {}
    for (b, _), n in cells.items():
        tot[b] = tot.get(b, 0) + n
    want = {k: (n, n * 10**6 // tot[k[0]]) for k, n in cells.items()}
    got = {
        (r_.p_brand, r_.band): (r_.n_lines, r_.share_ppm)
        for r_ in q_street_vs_list(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_basket_size_dist_vs_naive(spark, tmp_path):
    """Size cells, shares, and average values equal a Python sweep."""
    from locopy_spark.functions.numeric import SCALE
    from locopy_spark.queries.tpch import q_basket_size_dist

    r = _rng()
    orders, lines = [], []
    agg = {}
    for ok in range(150):
        n_items = r.randrange(1, 8)
        price = r.randrange(1000, 500000) / 100.0
        orders.append((ok, price))
        for j in range(n_items):
            lines.append((ok, j))
        n, v = agg.get(n_items, (0, 0))
        agg[n_items] = (n + 1, v + round(price * SCALE))
    _write(spark, tmp_path, "orders", orders,
           "o_orderkey long, o_totalprice double")
    _write(spark, tmp_path, "lineitem", lines,
           "l_orderkey long, l_linenumber int")
    total = sum(n for n, _ in agg.values())
    want = {
        k: (n, n * 10**6 // total, v / SCALE / n)
        for k, (n, v) in agg.items()
    }
    got = {
        r_.n_items: (r_.n_orders, r_.share_ppm, r_.avg_value)
        for r_ in q_basket_size_dist(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:2] == want[k][:2], k
        assert got[k][2] == pytest.approx(want[k][2], rel=1e-12), k


def test_revenue_bridge_vs_naive_and_closure(spark, tmp_path):
    """PVM effects equal a Python replay AND the decomposition closes
    exactly: delta == volume + price + residual for every continuing
    brand (the floor slack lands in the residual by construction)."""
    from locopy_spark.queries.tpch_ext import q_revenue_bridge

    r = _rng()
    parts, lines = [], []
    per = {}
    for pk in range(30):
        brand = f"B{pk % 4}"
        parts.append((pk, brand))
        for yr in (1996, 1997):
            if brand == "B3" and yr == 1997:
                continue  # exit brand
            for _ in range(r.randrange(1, 4)):
                qty = r.randrange(1, 20)
                ext = r.randrange(1000, 400000) / 100.0
                disc = r.randrange(0, 10) / 100.0
                lines.append(
                    (pk, float(qty), ext, disc, dt.date(yr, 6, 15))
                )
                rev_c, q = per.get((brand, yr), (0, 0))
                import math
                per[(brand, yr)] = (
                    rev_c + math.floor(ext * (1 - disc) * 100 + 0.5),
                    q + qty,
                )
    _write(spark, tmp_path, "part", parts, "p_partkey long, p_brand string")
    _write(spark, tmp_path, "lineitem", lines,
           "l_partkey long, l_quantity double, l_extendedprice double,"
           " l_discount double, l_shipdate date")
    rows = {r_.p_brand: r_ for r_ in q_revenue_bridge(spark, str(tmp_path)).collect()}
    brands = sorted({b for b, _ in per})
    assert set(rows) == set(brands)
    for b in brands:
        r1, q1 = per.get((b, 1996), (0, 0))
        r2, q2 = per.get((b, 1997), (0, 0))
        row = rows[b]
        assert (row.rev1_c, row.rev2_c, row.delta_c) == (r1, r2, r2 - r1)
        if q1 > 0 and q2 > 0:
            vol = (q2 - q1) * (r1 // q1)
            price = q2 * (r2 // q2 - r1 // q1)
            assert (row.volume_c, row.price_c) == (vol, price)
            assert row.residual_c == (r2 - r1) - vol - price
            assert row.delta_c == row.volume_c + row.price_c + row.residual_c
            assert row.bridge_class == "continuing"
        elif q1 == 0:
            assert row.bridge_class == "new"
        else:
            assert row.bridge_class == "exit"


def test_drawdown_vs_naive(spark, tmp_path):
    """Max drawdown, band histogram, and longest under-peak streak
    equal a direct running-peak sweep."""
    from locopy_spark.functions.numeric import SCALE
    from locopy_spark.queries.timeseries import DRAWDOWN_BANDS, q_drawdown

    r = _rng()
    base = dt.date(1996, 3, 1)
    rows, daily = [], {}
    oid = 0
    for d in range(90):
        for _ in range(r.randrange(1, 4)):
            v = r.randrange(500, 200000) / 100.0
            rows.append((oid, base + dt.timedelta(days=d), v))
            oid += 1
            k = (base + dt.timedelta(days=d) - dt.date(1970, 1, 1)).days
            daily[k] = daily.get(k, 0) + round(v * SCALE)
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey long, o_orderdate date, o_totalprice double")
    days = sorted(daily)
    peak, dd = 0, []
    for d in days:
        peak = max(peak, daily[d])
        dd.append((peak - daily[d]) * 10**6 // peak)
    bands = [0] * DRAWDOWN_BANDS
    for x in dd:
        bands[min(x // 100000, DRAWDOWN_BANDS - 1)] += 1
    longest = cur = 0
    for x in dd:
        cur = cur + 1 if x > 0 else 0
        longest = max(longest, cur)
    row = q_drawdown(spark, str(tmp_path)).collect()[0]
    assert row.n_days == len(days)
    assert row.max_dd_ppm == max(dd)
    assert row.longest_under_peak == longest
    for i in range(DRAWDOWN_BANDS):
        assert getattr(row, f"band{i}") == bands[i], i


def test_source_overlap_vs_naive(spark, tmp_path):
    """Pairwise vocabulary Jaccard equals a Python set sweep."""
    from locopy_spark.queries.corpus import t_source_overlap

    r = _rng()
    words = [f"w{j}" for j in range(40)]
    rows, vocab = [], {}
    did = 0
    for src_i in range(4):
        s = f"s{src_i}"
        vocab[s] = set()
        for _ in range(12):
            toks = [words[r.randrange(10 * (src_i % 2), 40)]
                    for _ in range(r.randrange(3, 12))]
            rows.append((did, " ".join(toks), "en", s, 1))
            vocab[s] |= set(toks)
            did += 1
    _write(spark, tmp_path, "documents", rows,
           "doc_id long, text string, lang string, source string,"
           " n_chars int")
    want = {}
    srcs = sorted(vocab)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1:]:
            inter = len(vocab[sa] & vocab[sb])
            union = len(vocab[sa] | vocab[sb])
            want[(sa, sb)] = (inter, union, inter * 10**6 // union)
    got = {
        (r_.src_a, r_.src_b): (r_.n_shared, r_.n_union, r_.jaccard_ppm)
        for r_ in t_source_overlap(spark, str(tmp_path)).collect()
    }
    assert got == {k: v for k, v in want.items() if v[0] > 0}


def test_type_overlap_vs_naive(spark, tmp_path):
    """Audience Jaccard equals a Python set sweep over user sets."""
    from locopy_spark.queries.events_ext import q_type_overlap

    r = _rng()
    types = ["view", "click", "buy"]
    rows, aud = [], {t: set() for t in types}
    eid = 0
    for u in range(60):
        for t in types:
            if r.random() < 0.5:
                rows.append((eid, u, t, dt.datetime(2024, 1, 1, 0, 0, eid % 60)))
                aud[t].add(u)
                eid += 1
    _write(spark, tmp_path, "events", rows,
           "event_id long, user_id long, event_type string,"
           " ts timestamp_ntz")
    want = {}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            a, b = sorted((ta, tb))
            inter = len(aud[ta] & aud[tb])
            union = len(aud[ta] | aud[tb])
            if inter:
                want[(a, b)] = (inter, union, inter * 10**6 // union)
    got = {
        (r_.type_a, r_.type_b): (r_.n_shared, r_.n_union, r_.jaccard_ppm)
        for r_ in q_type_overlap(spark, str(tmp_path)).collect()
    }
    assert got == want
