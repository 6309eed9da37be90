"""Independent naive-reference checks for the round-10 additions
(q_jarque_bera, q_cochran_q): textbook re-derivations in plain Python
on small hand-built data — same answers, independently derived — plus
the degenerate states the gated data never hits (constant group,
all-or-nothing touch patterns)."""

import math
import random
from datetime import datetime

import pytest

SEED = 20260816


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(path / f"{name}.parquet")
    )


def test_jarque_bera_matches_textbook(spark, tmp_path):
    """Population skewness/kurtosis/JB from the raw definition (mean of
    centered powers) must match the engine's power-sum closure."""
    from locopy_spark.queries.stats import q_jarque_bera

    r = random.Random(SEED)
    rows = []
    vals = {"1-URGENT": [], "2-HIGH": []}
    for i in range(400):
        pri = "1-URGENT" if i % 2 == 0 else "2-HIGH"
        # skewed-ish integers so skew/kurt are non-trivial
        v = r.randrange(1, 50) ** 2
        vals[pri].append(v)
        rows.append((i, pri, float(v), datetime(1995, 3, 1)))
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderdate timestamp",
    )
    got = {
        r_.o_orderpriority: r_
        for r_ in q_jarque_bera(spark, str(tmp_path)).collect()
    }
    for pri, xs in vals.items():
        n = len(xs)
        mu = sum(xs) / n
        m2 = sum((x - mu) ** 2 for x in xs) / n
        m3 = sum((x - mu) ** 3 for x in xs) / n
        m4 = sum((x - mu) ** 4 for x in xs) / n
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3.0
        jb = n / 6.0 * (skew**2 + kurt**2 / 4.0)
        g = got[pri]
        assert g.n == n
        assert g.skew == pytest.approx(skew, rel=1e-12)
        assert g.kurt_excess == pytest.approx(kurt, rel=1e-12)
        assert g.jb == pytest.approx(jb, rel=1e-12)
        assert g.reject_95 == (jb > 5.991464547107979)


def test_jarque_bera_constant_group_nulls(spark, tmp_path):
    """A constant-value group (zero variance) must yield NULL shape
    stats via the exact integer guard — never Inf/NaN or a crash."""
    from locopy_spark.queries.stats import q_jarque_bera

    rows = [(i, "1-URGENT", 100.0, datetime(1995, 3, 1)) for i in range(8)]
    rows += [
        (100 + i, "2-HIGH", float(10 + i * i), datetime(1995, 3, 1))
        for i in range(8)
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderdate timestamp",
    )
    got = {
        r_.o_orderpriority: r_
        for r_ in q_jarque_bera(spark, str(tmp_path)).collect()
    }
    c = got["1-URGENT"]
    assert c.n == 8
    assert c.skew is None and c.kurt_excess is None
    assert c.jb is None and c.reject_95 is None
    v = got["2-HIGH"]
    assert v.jb is not None and math.isfinite(v.jb)


def _cochran_bruteforce(x):
    """Textbook Cochran's Q over binary matrix x: {user: [k flags]}."""
    k = len(next(iter(x.values())))
    cj = [sum(flags[j] for flags in x.values()) for j in range(k)]
    ri = [sum(flags) for flags in x.values()]
    n_touch = sum(ri)
    den = k * n_touch - sum(r * r for r in ri)
    if den <= 0:
        return cj, None
    num = (k - 1) * (k * sum(c * c for c in cj) - n_touch * n_touch)
    return cj, num / den


def test_cochran_q_matches_textbook(spark, tmp_path):
    """Q from the definitional binary matrix (pre-conversion touch
    flags) must match the engine's mask-grid closure, including the
    retroactive-exclusion semantics (touch after purchase ≠ touched)."""
    from locopy_spark.queries.events_ext import (
        SHAPLEY_CHANNELS,
        q_cochran_q,
    )

    r = random.Random(SEED)
    rows, eid = [], 0
    x = {}
    for uid in range(60):
        conv = r.random() < 0.4
        pday = 10
        flags = []
        n_ev_before = len(rows)
        for j, ch in enumerate(SHAPLEY_CHANNELS):
            touched = r.random() < 0.35 + 0.12 * j  # unequal channel rates
            before = r.random() < 0.7
            if touched:
                eid += 1
                day = r.randrange(1, pday) if before else pday + r.randrange(1, 5)
                rows.append((eid, datetime(2000, 1, 1 + day), uid, ch, 1.0, "{}"))
            flags.append(1 if touched and (before or not conv) else 0)
        if conv:
            eid += 1
            rows.append((eid, datetime(2000, 1, 1 + pday), uid, "purchase", 1.0, "{}"))
        # a user with zero events never reaches the state — the engine
        # (correctly) can't count what never arrived
        if len(rows) > n_ev_before:
            x[uid] = flags
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    cj, q = _cochran_bruteforce(x)
    got = q_cochran_q(spark, str(tmp_path)).collect()[0]
    assert got.n_users == len(x)
    assert [
        got[f"n_{ch}"] for ch in SHAPLEY_CHANNELS
    ] == cj
    assert got.q == pytest.approx(q, rel=1e-12)
    assert got.reject_95 == (q > 7.814727903251179)


def test_cochran_q_all_or_nothing_nulls(spark, tmp_path):
    """Every user touching ALL channels (or none) zeroes the Q
    denominator: NULL q/reject via the exact integer guard."""
    from locopy_spark.queries.events_ext import (
        SHAPLEY_CHANNELS,
        q_cochran_q,
    )

    rows, eid = [], 0
    for uid in range(6):
        for ch in SHAPLEY_CHANNELS:
            eid += 1
            rows.append((eid, datetime(2000, 1, 2), uid, ch, 1.0, "{}"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = q_cochran_q(spark, str(tmp_path)).collect()[0]
    assert got.n_users == 6
    assert got.q is None and got.reject_95 is None
