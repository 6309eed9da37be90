"""Regression pins for the round-9 advisor findings (ADVICE r9).

1. q_attribution_shapley's zeta transform must be TOTAL: every v(S)
   row exists (v=0) even when no user mask is a subset of S — the
   degenerate grid with no mask-0 user used to produce 0 Spark rows
   and structurally-divergent DuckDB partial rows.
2. The growth/bass week index must floor identically in both engines
   for pre-1970 timestamps (DuckDB ``//`` truncates toward zero;
   Spark's mod trick floors — the oracles carry the same floor form).
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


def _duck_on(tmp_path, tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"'{tmp_path}/{t}.parquet/*.parquet'"
        )
    return con


def test_shapley_total_zeta_no_mask0_users(spark, tmp_path):
    """No user has mask 0 (every user touches >=1 channel before any
    purchase): v(0)-adjacent coalitions are absent from the grid, so
    an inner-join zeta transform drops rows — Spark used to return 0
    rows and DuckDB partial/NULL rows.  Both engines must now emit
    all k channels, match each other, match the permutation brute
    force, and carry v_empty = 0 (not NULL)."""
    from locopy_spark.queries.events_ext import (
        SHAPLEY_CHANNELS,
        q_attribution_shapley,
    )
    from locopy_spark.queries.events_ext import ORACLE

    k = len(SHAPLEY_CHANNELS)
    rows, eid = [], 0

    def ev(uid, typ, day):
        nonlocal eid
        eid += 1
        rows.append((eid, _ts(day), uid, typ, 1.0, "{}"))

    r = random.Random(SEED)
    masks, convs = {}, {}
    for uid in range(40):
        # every user touches at least one channel BEFORE day 10
        touched = r.sample(SHAPLEY_CHANNELS, r.randrange(1, k + 1))
        conv = r.random() < 0.5
        mask = 0
        for ch in touched:
            ev(uid, ch, r.randrange(1, 10))
            mask |= 1 << SHAPLEY_CHANNELS.index(ch)
        if conv:
            ev(uid, "purchase", 10)
        masks[uid], convs[uid] = mask, conv
    assert 0 not in masks.values()  # the degenerate precondition
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )

    def v(S):
        return sum(1 for u in masks if convs[u] and (masks[u] | S) == S)

    phi = {ch: 0 for ch in SHAPLEY_CHANNELS}
    for perm in itertools.permutations(range(k)):
        S = 0
        for i in perm:
            phi[SHAPLEY_CHANNELS[i]] += v(S | (1 << i)) - v(S)
            S |= 1 << i

    got = q_attribution_shapley(spark, str(tmp_path)).collect()
    assert len(got) == k  # used to be 0 rows
    assert {r_.channel: r_.phi_x24 for r_ in got} == phi
    assert all(r_.v_empty == 0 for r_ in got)  # total transform: 0, not NULL

    duck = _duck_on(tmp_path, ["events"])
    try:
        odf = duck.execute(ORACLE["q_attribution_shapley"]).fetchdf()
    finally:
        duck.close()
    assert len(odf) == k
    assert dict(zip(odf.channel, odf.phi_x24)) == phi
    assert (odf.v_empty == 0).all()
    spark_rows = sorted((r_.channel, r_.phi_x24, r_.v_full, r_.v_empty,
                         r_.share_ppm) for r_ in got)
    duck_rows = sorted(
        tuple(int(x) if not isinstance(x, str) else x for x in t)
        for t in odf[["channel", "phi_x24", "v_full", "v_empty",
                      "share_ppm"]].itertuples(index=False)
    )
    assert spark_rows == duck_rows


def _cmp_engines(sdf, odf):
    a = sorted(tuple(r) for r in sdf.collect())
    b = sorted(tuple(None if x != x else
                     (int(x) if hasattr(x, "item") and "int" in
                      type(x).__name__.lower() else x)
                     for x in t)
               for t in odf.itertuples(index=False))
    assert a == b, f"\nspark={a}\nduck ={b}"


def test_growth_accounting_pre1970_weeks_match(spark, tmp_path):
    """Week indices for pre-1970 timestamps must FLOOR identically in
    both engines: day -8 is week -2, not week -1.  Spark floors via
    the remainder trick; the oracle used plain ``//`` (truncation),
    which widened the week-0 bin and shifted every negative week."""
    from locopy_spark.queries.timeseries import ORACLE, q_growth_accounting

    rows, eid = [], 0
    # users active across the epoch boundary: days -20..+15
    for uid, days in ((1, [-20, -13, -6, 1, 8]), (2, [-8, -1, 6]),
                      (3, [-15, 15]), (4, [3, 10])):
        for d in days:
            eid += 1
            rows.append((eid, datetime(1970, 1, 1) +
                         __import__("datetime").timedelta(days=d),
                         uid, "view", 1.0, "{}"))
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = q_growth_accounting(spark, str(tmp_path))
    # day -8 (1969-12-24) must land in week -2 → week_start_day -14
    starts = [r.week_start_day for r in got.collect()]
    assert -14 in starts and min(starts) == -21
    duck = _duck_on(tmp_path, ["events"])
    try:
        odf = duck.execute(ORACLE["q_growth_accounting"]).fetchdf()
    finally:
        duck.close()
    _cmp_engines(got, odf)


def test_bass_diffusion_pre1970_weeks_match(spark, tmp_path):
    """Same floor-vs-truncate pin for bass_firsts on o_orderdate."""
    from datetime import timedelta

    from locopy_spark.queries.timeseries import ORACLE, q_bass_diffusion

    r = random.Random(SEED)
    rows = []
    for cust in range(1, 40):
        first = r.randrange(-30, 30)
        for d in sorted({first} | {first + r.randrange(0, 40)
                                   for _ in range(2)}):
            rows.append((cust, datetime(1970, 1, 1) + timedelta(days=d)))
    _write(spark, tmp_path, "orders", rows,
           "o_custkey long, o_orderdate timestamp")
    got = q_bass_diffusion(spark, str(tmp_path))
    duck = _duck_on(tmp_path, ["orders"])
    try:
        odf = duck.execute(ORACLE["q_bass_diffusion"]).fetchdf()
    finally:
        duck.close()
    _cmp_engines(got, odf)


def test_ols_r2_no_bigint_wrap_at_warehouse_scale(spark):
    """The r2 inner quotient num_s²/den_t passes 2^63 at warehouse
    scale (measured ~6.5e19 at sf0.1) and Spark's ``div`` silently
    WRAPPED it — caught by the round-10 full-surface sf0.1 sweep, the
    only cross-engine mismatch in 295 keys.  The fix floors the inner
    division entirely in DECIMAL via a − a%b.  This pin feeds
    ols_report a daily table with sf0.1-scale magnitudes and checks
    r2 against exact Python integer arithmetic."""
    from pyspark.sql import functions as F  # noqa: F401

    from locopy_spark.queries.trends import OLS_EPOCH, ols_report

    import datetime

    epoch = datetime.date(1992, 1, 1)
    # y ~ 3e8 cents/day over 2400 days with a trend + wobble: num_s²
    # / den_t lands well past 2^63, like the real sf0.1 data
    rows = []
    for t in range(2400):
        y = 300_000_000 + 40_000 * t + (t % 97) * 1_000_003
        rows.append(("1-URGENT", epoch + datetime.timedelta(days=t), y))
    daily = spark.createDataFrame(
        rows, "o_orderpriority string, day date, y long"
    )
    got = ols_report(daily).collect()[0]
    n = len(rows)
    ts = [t for t in range(2400)]
    ys = [y for _, _, y in rows]
    st, stt = sum(ts), sum(t * t for t in ts)
    sy, sty, syy = (
        sum(ys),
        sum(t * y for t, y in zip(ts, ys)),
        sum(y * y for y in ys),
    )
    num_s = n * sty - st * sy
    den_t = n * stt - st * st
    num_y = n * syy - sy * sy
    assert num_s * num_s // den_t > 2**63  # the wrap regime
    want_ppb = (num_s * num_s // den_t) * 10**9 // num_y
    assert got.r2 == want_ppb / 1e9
