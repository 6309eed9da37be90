"""Unit tests for the round-5 corpus-planning / similarity additions:
hand-computed expectations on tiny constructed corpora (the oracle gate
covers the full-table paths; these pin the semantics that the gate's
aggregate hashes could in principle satisfy by accident)."""

import pytest
from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    """Write a documents.parquet shaped like the testdata table."""
    df = spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    d = tmp_path / "docs_sf"
    d.mkdir(exist_ok=True)
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_mips_ranks_by_dot_not_cosine(spark):
    """A long vector must beat a perfectly-aligned short one under MIPS
    — the exact case where cosine ranks them the other way."""
    from locopy_spark.operators.similarity import knn_bruteforce, mips_bruteforce

    # query [1,0]; neighbor 1 = [10,1] (big dot, cosine < 1),
    # neighbor 2 = [0.5,0] (dot 0.5, cosine exactly 1)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [10.0, 1.0]), (2, [0.5, 0.0])],
        "vec_id long, embedding array<float>",
    )
    mips = {
        r.rk: r.neighbor_id
        for r in mips_bruteforce(emb, query_ids=[0], k=2).collect()
    }
    cos = {
        r.rk: r.neighbor_id
        for r in knn_bruteforce(emb, query_ids=[0], k=2).collect()
    }
    assert mips[1] == 1 and mips[2] == 2
    assert cos[1] == 2 and cos[2] == 1


def test_length_histogram_hand_computed(spark, tmp_path):
    from locopy_spark.queries.corpus import (
        LEN_BIN_TOKENS,
        p_length_histogram,
    )

    assert LEN_BIN_TOKENS == 64
    # 3 tokens → bin 0; 70 tokens → bin 1; another 3-token doc → bin 0
    rows = [
        ("a b c", "en", "s0"),
        (" ".join(["w"] * 70), "en", "s0"),
        ("x y z", "en", "s1"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.bin: r for r in p_length_histogram(spark, sf).collect()}
    assert set(got) == {0, 1}
    assert (got[0].n_docs, got[0].tokens) == (2, 6)
    assert (got[1].n_docs, got[1].tokens) == (1, 70)
    # cumulative ppm: 6/76 then 76/76 exactly (floored)
    assert got[0].cum_token_ppm == 6 * 1_000_000 // 76
    assert got[1].cum_token_ppm == 1_000_000


def test_cluster_stats_singleton_mass(spark, tmp_path):
    from locopy_spark.queries.docs_ext import d_cluster_stats

    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (dup, "en", "s0"),
        (dup, "en", "s1"),  # exact duplicate → certain LSH pair
        ("completely different text about distributed query engines", "en", "s0"),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {r.cluster_size: r for r in d_cluster_stats(spark, sf).collect()}
    assert got[2].n_clusters == 1 and got[2].n_docs == 2
    assert got[1].n_clusters == 1 and got[1].n_docs == 1


def test_tokenizer_fertility_exact(spark, tmp_path):
    from locopy_spark.queries.corpus import p_tokenizer_fertility

    rows = [
        ("alpha beta", "en", "s0"),   # 10 chars, 2 ws tokens
        ("gamma", "en", "s0"),        # 5 chars, 1 ws token
        ("uno dos", "es", "s0"),      # 7 chars, 2 ws tokens
    ]
    sf = _write_docs(spark, tmp_path, rows)
    got = {(r.source, r.lang): r for r in p_tokenizer_fertility(spark, sf).collect()}
    en = got[("s0", "en")]
    assert (en.n_docs, en.chars, en.ws_tokens) == (2, 15, 3)
    assert en.chars_per_bpe_milli == 15 * 1000 // en.bpe_tokens
    es = got[("s0", "es")]
    assert (es.chars, es.ws_tokens) == (7, 2)


def test_curriculum_stages_cover_all_docs(spark, sf_dir):
    """Stages partition the corpus exactly: doc counts sum to |docs|,
    NTILE balance holds (sizes differ by ≤1), stage 1 mean quality is
    the maximum (descending curriculum)."""
    from locopy_spark.queries.corpus import (
        CURRICULUM_STAGES,
        p_curriculum_stages,
    )
    from locopy_spark.sources.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = p_curriculum_stages(spark, sf_dir).collect()
    assert len(rows) == CURRICULUM_STAGES
    assert sum(r.n_docs for r in rows) == n_docs
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    qualities = [r.mean_quality for r in rows]
    assert qualities[0] == max(qualities)
    # monotone non-increasing stage means (ties possible)
    assert all(a >= b for a, b in zip(qualities, qualities[1:]))


def test_second_moment_matrix_hand_computed(spark):
    """2-dim, 2-row case: every cell of the fixed-point moment matrix
    equals the per-row floor-then-sum model."""
    import math

    from locopy_spark.functions.vectors import FIXED_SCALE
    from locopy_spark.operators.similarity import second_moment_matrix

    rows = [(0, [0.5, -0.25]), (1, [0.1, 0.3])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.i, r.j): r.s_ij
        for r in second_moment_matrix(emb, dim=2).collect()
    }

    import numpy as np

    def fx(a, b):
        # float32 storage round-trip, then the double product pipeline
        a = float(np.float32(a)); b = float(np.float32(b))
        return math.floor(a * b * FIXED_SCALE + 0.5)

    vecs = [r[1] for r in rows]
    for (i, j) in [(1, 1), (1, 2), (2, 2)]:
        want = sum(fx(v[i - 1], v[j - 1]) for v in vecs)
        assert got[(i, j)] == want, (i, j, got[(i, j)], want)
    assert set(got) == {(1, 1), (1, 2), (2, 2)}  # upper triangle only


def test_fuzzy_match_blocking_excludes_cross_block(spark, tmp_path):
    """Pairs within edit distance but in different first-token blocks
    are (by design) not candidates; in-block pairs verify exactly."""
    from locopy_spark.queries.tpch_ext import q_fuzzy_match

    rows = [
        (0, "red rod", "B1", "T", 1, 1.0),
        (1, "red ring", "B1", "T", 1, 1.0),
        (2, "ted rod", "B1", "T", 1, 1.0),  # dist 1 to 'red rod', other block
        (3, "red rod", "B1", "T", 1, 1.0),  # duplicate name → n_rows 2
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    d = tmp_path / "fz"
    d.mkdir()
    df.write.parquet(str(d / "part.parquet"))
    got = {
        (r.name_a, r.name_b): (r.dist, r.rows_a, r.rows_b)
        for r in q_fuzzy_match(spark, str(d)).collect()
    }
    assert got == {("red ring", "red rod"): (3, 1, 2)}


def test_freq_drift_identical_halves_zero(spark, tmp_path):
    """A perfectly-mirrored A/A split (same text in both halves) must
    score chi2_ppm == 0 — the metric's fixed point."""
    from locopy_spark.queries.docs_ext import t_freq_drift

    text = "alpha beta gamma alpha"
    rows = [(i, text, "en", "s0", len(text)) for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    d = tmp_path / "fd"
    d.mkdir()
    df.write.parquet(str(d / "documents.parquet"))
    r = t_freq_drift(spark, str(d)).collect()
    assert len(r) == 1 and r[0].chi2_ppm == 0 and r[0].vocab == 3


def test_attribution_linear_hand_computed(spark, tmp_path):
    """One purchase (value 12.0) with 2 views + 1 click in-window:
    views credit 12000·2 div 3 = 8000, click 12000·1 div 3 = 4000."""
    import datetime as dt

    from locopy_spark.queries.events_ext import q_attribution_linear

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, base - dt.timedelta(minutes=10), 7, "view", 0.0),
        (2, base - dt.timedelta(minutes=8), 7, "view", 0.0),
        (3, base - dt.timedelta(minutes=5), 7, "click", 0.0),
        (4, base, 7, "purchase", 12.0),
        # out-of-window view (40 min before) must not be credited
        (5, base - dt.timedelta(minutes=40), 7, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    d = tmp_path / "attr"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    got = {
        r.touch_type: (r.n_purchases, r.credit_fix)
        for r in q_attribution_linear(spark, str(d)).collect()
    }
    assert got == {"view": (1, 8000), "click": (1, 4000)}
