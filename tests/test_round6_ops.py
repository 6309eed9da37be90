"""Pencil-checked semantics for the round-6 graph/retail/journey
operators: q_assortativity, q_pareto_abc, q_top_paths."""

import datetime as dt

import pytest


def _write_lineitem(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(path / "lineitem.parquet")
    )


def test_assortativity_path_graph(spark, tmp_path):
    """Path a−b−c: degrees (1,2,1); directed pairs (1,2),(2,1),(2,1),
    (1,2) → perfect disassortativity r = −1 (the classic result for
    a path of three)."""
    from locopy_spark.queries.mining import q_assortativity

    rows = [(1, 1), (1, 2), (2, 2), (2, 3)]
    _write_lineitem(
        spark, tmp_path, rows, "l_orderkey long, l_partkey long"
    )
    r = q_assortativity(spark, str(tmp_path)).collect()[0]
    assert (r.n_edges, r.n_dir) == (2, 4)
    assert r.assortativity == pytest.approx(-1.0)


def test_assortativity_regular_graph_null(spark, tmp_path):
    """4-cycle: every degree 2 → zero degree variance → NULL via the
    exact integer guard (not an ANSI divide-by-zero)."""
    from locopy_spark.queries.mining import q_assortativity

    rows = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4), (4, 4), (4, 1)]
    _write_lineitem(
        spark, tmp_path, rows, "l_orderkey long, l_partkey long"
    )
    r = q_assortativity(spark, str(tmp_path)).collect()[0]
    assert (r.n_edges, r.n_dir) == (4, 8)
    assert r.assortativity is None


def test_pareto_abc_hand_case(spark, tmp_path):
    """Part revenues 5,3,1,1 (total 10): descending cumulative shares
    50 % → A, 80 % → B, 90 % → B (boundary inclusive), 100 % → C."""
    from locopy_spark.queries.tpch_ext import q_pareto_abc

    rows = [(1, 5.0), (2, 3.0), (3, 1.0), (4, 1.0)]
    _write_lineitem(
        spark, tmp_path, rows, "l_partkey long, l_extendedprice double"
    )
    out = {r.abc_class: r for r in q_pareto_abc(spark, str(tmp_path)).collect()}
    assert (out["A"].n_parts, out["A"].class_rev_fix) == (1, 5)
    assert (out["B"].n_parts, out["B"].class_rev_fix) == (2, 4)
    assert (out["C"].n_parts, out["C"].class_rev_fix) == (1, 1)
    assert out["A"].rev_share == pytest.approx(0.5)
    assert out["B"].rev_share == pytest.approx(0.4)


def test_top_paths_order_and_cap(spark, tmp_path):
    """Two users share journey A>B (beats B's single user-day); a
    22-event user-day is cut at PATH_MAX_EVENTS=20 types."""
    from locopy_spark.queries.events_ext import PATH_MAX_EVENTS, q_top_paths

    base = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = [
        (1, base, 1, "A"), (2, base + dt.timedelta(minutes=1), 1, "B"),
        (3, base, 2, "A"), (4, base + dt.timedelta(minutes=1), 2, "B"),
        (5, base, 3, "B"),
    ]
    rows += [
        (10 + i, base + dt.timedelta(seconds=i), 4, "C") for i in range(22)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = q_top_paths(spark, str(tmp_path)).collect()
    assert (got[0].path, got[0].n_user_days) == ("A>B", 2)
    capped = ">".join(["C"] * PATH_MAX_EVENTS)
    assert {(r.path, r.n_user_days) for r in got[1:]} == {
        ("B", 1), (capped, 1),
    }


def test_xcorr_shifted_series(spark, tmp_path):
    """Purchases exactly replay views one hour later (views 1,0,2 at
    hours 0..2 → purchases 1,0,2 at hours 1..3): xcorr at lag +1 is
    exactly 1 over its 3 dense-zero-filled pairs."""
    from locopy_spark.queries.events_ext import q_xcorr

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(h, m):
        return base + dt.timedelta(hours=h, minutes=m)

    rows = [
        (1, at(0, 30), 1, "view"),
        (2, at(2, 10), 1, "view"),
        (3, at(2, 20), 2, "view"),
        (4, at(3, 10), 3, "view"),
        (5, at(1, 15), 1, "purchase"),
        (6, at(3, 5), 2, "purchase"),
        (7, at(3, 40), 3, "purchase"),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.lag: r for r in q_xcorr(spark, str(tmp_path)).collect()}
    assert out[1].n == 3
    assert out[1].xcorr == pytest.approx(1.0)


def test_seqlen_plan_hand_case(spark, tmp_path):
    """Docs of 3 and 5 whitespace tokens: every candidate L fits each
    doc in one sequence → padded = 2·L, waste_ppm is the exact floor
    of (2L−8)·10⁶/2L (L=128: 968750 ppm, utilization 8/256)."""
    from locopy_spark.queries.docs_ext import p_seqlen_plan

    rows = [(1, "a b c"), (2, "a b c d e")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {r.max_len: r for r in p_seqlen_plan(spark, str(tmp_path)).collect()}
    r128 = out[128]
    assert (r128.n_docs, r128.total_tokens, r128.n_seqs) == (2, 8, 2)
    assert r128.padded_tokens == 256
    assert r128.waste_ppm == (256 - 8) * 10**6 // 256
    assert r128.utilization == pytest.approx(8 / 256)
    assert out[1024].padded_tokens == 2048


def test_vocab_coverage_hand_case(spark, tmp_path):
    """Vocab {a:6, b:3, c:1} (V=3, 10 occurrences): p=10 % → k=⌈0.3⌉=1
    type covering 6/10 (600000 ppm); p=50 % → k=2 covering 9/10."""
    from locopy_spark.queries.corpus import p_vocab_coverage

    rows = [(1, "a a a b b"), (2, "a a a b c")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {r.pct: r for r in p_vocab_coverage(spark, str(tmp_path)).collect()}
    assert (out[10].vocab, out[10].k_types, out[10].covered_occ) == (3, 1, 6)
    assert out[10].coverage_ppm == 600000
    assert (out[50].k_types, out[50].covered_occ) == (2, 9)
    assert out[50].coverage_ppm == 900000


def test_weekday_uplift_hand_case(spark, tmp_path):
    """1970-01-01 was a Thursday (dow 4): orders of 2, 2 on Thursday
    and 1 on Friday → Thursday avg 2 vs overall 5/3:
    uplift = 2/(5/3) = 1.2 → 1200000 ppm exactly."""
    import datetime as ddt

    from locopy_spark.queries.tpch_ext import q_weekday_uplift

    rows = [
        (ddt.date(1970, 1, 1), 2.0),
        (ddt.date(1970, 1, 1), 2.0),
        (ddt.date(1970, 1, 2), 1.0),
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.dow: r for r in q_weekday_uplift(spark, str(tmp_path)).collect()}
    assert out[4].n_orders == 2 and out[5].n_orders == 1
    assert out[4].uplift_ppm == 1200000
    assert out[5].uplift_ppm == 600000
    assert out[4].revenue == pytest.approx(4.0)


def test_interpurchase_hand_case(spark, tmp_path):
    """Customer 1 (segment A) orders on days 0, 10, 40 → gaps 10, 30;
    customer 2 (A) on days 0, 5 → gap 5. Segment A: n=3, mean 15,
    lower median (rank 2 of 3) = 10."""
    from locopy_spark.queries.events_ext import q_interpurchase

    cust = [(1, "A"), (2, "A")]
    spark.createDataFrame(
        cust, "c_custkey long, c_mktsegment string"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [
        (1, 101, dt.date(1970, 1, 1)),
        (1, 102, dt.date(1970, 1, 11)),
        (1, 103, dt.date(1970, 2, 10)),
        (2, 201, dt.date(1970, 1, 1)),
        (2, 202, dt.date(1970, 1, 6)),
    ]
    spark.createDataFrame(
        orders, "o_custkey long, o_orderkey long, o_orderdate date"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    r = q_interpurchase(spark, str(tmp_path)).collect()[0]
    assert (r.c_mktsegment, r.n_gaps) == ("A", 3)
    assert r.mean_gap_days == pytest.approx(45 / 3)
    assert r.median_gap_days == 10


def test_resume_plan_naive_reference(spark, tmp_path):
    """p_resume_plan against a pure-Python simulation: 8 docs with
    known token counts, consumed in md5(doc_id) order until each
    checkpoint; docs are atomic so the resume doc is the first whose
    inclusive prefix overshoots, and its shard follows the
    p_shard_plan formula."""
    import hashlib

    from locopy_spark.queries.corpus import (
        N_SHARDS,
        RESUME_PCTS,
        p_resume_plan,
    )

    rows = [(i, " ".join(["w"] * (i + 1))) for i in range(8)]  # i+1 toks
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))

    order = sorted(rows, key=lambda r: hashlib.md5(str(r[0]).encode()).hexdigest())
    toks = [r[0] + 1 for r in order]
    tot = sum(toks)
    want = []
    for pct in RESUME_PCTS:
        ckpt = tot * pct // 100
        done, run = 0, 0
        while run + toks[done] <= ckpt:
            run += toks[done]
            done += 1
        want.append(
            (
                pct,
                ckpt,
                done,
                run,
                len(order) - done,
                tot - run,
                order[done][0],          # resume doc_id
                run * N_SHARDS // tot,   # its shard (exclusive prefix)
            )
        )
    got = [tuple(r) for r in p_resume_plan(spark, str(tmp_path)).collect()]
    assert got == want


def test_graph_queries_accept_injected_edges(spark, sf_dir):
    """The bench harness materializes copurchase_edges once (bucketed)
    and injects it into every graph consumer via ``edges=`` — the
    amortized 100x deployment shape. Injection must be result-identical
    to the standalone build."""
    from locopy_spark.queries.mining import (
        copurchase_edges,
        q_assortativity,
        q_clustering_coef,
        q_degree_dist,
        q_jaccard_links,
    )

    from pyspark.sql import functions as F

    e = copurchase_edges(spark, sf_dir).localCheckpoint()
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    for fn in (q_assortativity, q_degree_dist, q_jaccard_links,
               q_clustering_coef):
        a = [tuple(r) for r in fn(spark, sf_dir).collect()]
        b = [tuple(r) for r in fn(spark, sf_dir, edges=e).collect()]
        assert a == b, fn.__name__
        # round 10: the degree table is an index-time artifact too —
        # injecting it with the edges must stay result-identical
        c = [tuple(r) for r in fn(spark, sf_dir, edges=e, degrees=deg).collect()]
        assert a == c, f"{fn.__name__} (degrees=)"


def test_pagerank_and_census_accept_injected_index(spark, sf_dir):
    """q_pagerank served from the materialized (src, dst, d) table +
    degree table (the bench's round-10 shared shape) and the census
    with an injected degree table must match the standalone builds
    bit-for-bit."""
    from pyspark.sql import functions as F

    from locopy_spark.queries.mining import (
        copurchase_edges,
        q_graph_triangles,
        q_kcore,
        q_pagerank,
    )

    e = copurchase_edges(spark, sf_dir).localCheckpoint()
    und = e.selectExpr("a AS src", "b AS dst").unionByName(
        e.selectExpr("b AS src", "a AS dst")
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    edges_deg = und.join(deg, "src").repartition("dst").localCheckpoint()
    degv = deg.selectExpr("src AS v", "d").localCheckpoint()
    a = [tuple(r) for r in q_pagerank(spark, sf_dir).collect()]
    b = [
        tuple(r)
        for r in q_pagerank(
            spark, sf_dir, edges_deg=edges_deg, degrees=degv
        ).collect()
    ]
    assert a == b
    # edges_deg without degrees (the dropDuplicates fallback)
    c = [
        tuple(r)
        for r in q_pagerank(spark, sf_dir, edges_deg=edges_deg).collect()
    ]
    assert a == c
    for fn in (q_graph_triangles, q_kcore):
        x = [tuple(r) for r in fn(spark, sf_dir).collect()]
        y = [tuple(r) for r in fn(spark, sf_dir, edges=e, degrees=degv).collect()]
        assert x == y, fn.__name__


def test_lpa_accepts_injected_sparsified_edges(spark, sf_dir):
    """q_lpa_communities consumes the SPARSIFIED relation (support >=
    LPA_MIN_SUPPORT); injecting it — the slice the bench derives from
    the one support-annotated shared edge table — must be
    result-identical to the standalone build."""
    from locopy_spark.queries.mining import (
        q_lpa_communities,
        repeat_copurchase_edges,
    )

    e = repeat_copurchase_edges(spark, sf_dir).localCheckpoint()
    a = [tuple(r) for r in q_lpa_communities(spark, sf_dir).collect()]
    b = [tuple(r) for r in q_lpa_communities(spark, sf_dir, edges=e).collect()]
    assert a == b
