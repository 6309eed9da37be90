"""Degenerate-input smoke gate: constant-valued columns.

The two-sample panel property test (round 9) proved the failure mode
is real: a zero-variance input turned a finisher's shared double
expression into an ANSI DIVIDE_BY_ZERO *crash*, not a wrong number —
and a degenerate early micro-batch can feed any stream maintainer
exactly that.  This gate drives the statistics/experimentation family
over a fully CONSTANT mini star schema (every order the same price,
priority and day; every lineitem identical; every event the same
type-pattern) and asserts each query *runs* — degenerate ratios must
close as NULL, never as an engine exception.
"""

from datetime import datetime

import pytest

# every key here reads only orders/customer/lineitem/part/events and
# owns at least one ratio/variance denominator that a constant input
# can zero
DEGENERATE_KEYS = [
    "q_anova", "q_posthoc_pairs", "q_levene", "q_kruskal_wallis",
    "q_correlation", "q_spearman", "q_stats_moments", "q_gini",
    "q_cramers_v", "q_odds_ratio", "q_cuped", "q_did", "q_mcnemar",
    "q_mann_whitney", "q_ks_test", "q_cliffs_delta", "q_benford",
    "q_wilcoxon", "q_autocorr", "q_runs_test", "q_kendall_tau",
    "q_mann_kendall", "q_theil_sen", "q_ols_trend",
    "q_cochran_armitage", "q_ab_test", "q_funnel_sig", "q_sprt",
    "q_bass_diffusion", "q_loyalty_migration", "q_ndr",
    "q_growth_accounting", "q_capture_recapture",
]


@pytest.fixture(scope="module")
def constant_star(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("constant_star")

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(str(tmp / f"{name}.parquet"))

    w(
        "orders",
        [
            (i, i % 5, datetime(1997, 6, 1), 100.0, "3-MEDIUM")
            for i in range(20)
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp,"
        " o_totalprice double, o_orderpriority string",
    )
    w(
        "customer",
        [
            (i, "BUILDING" if i % 2 == 0 else "MACHINERY", 0)
            for i in range(5)
        ],
        "c_custkey long, c_mktsegment string, c_nationkey int",
    )
    w(
        "lineitem",
        [
            (
                i, 1, 1, 1, 10.0, 0.0, 100.0,
                datetime(1997, 6, 2), "N", "O",
                datetime(1997, 6, 3), datetime(1997, 6, 4),
            )
            for i in range(20)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_discount double,"
        " l_extendedprice double, l_shipdate timestamp,"
        " l_returnflag string, l_linestatus string,"
        " l_commitdate timestamp, l_receiptdate timestamp",
    )
    w(
        "part",
        [(1, "PROMO BRASS", "Brand#1", "a", 10.0)],
        "p_partkey long, p_type string, p_brand string, p_name string,"
        " p_retailprice double",
    )
    # constant events: one view per user, same day — no conversions
    w(
        "events",
        [
            (i, datetime(2000, 1, 5), i % 7, "view", 1.0, "{}")
            for i in range(20)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    return str(tmp)


@pytest.mark.parametrize("key", DEGENERATE_KEYS)
def test_constant_inputs_do_not_crash(spark, constant_star, key):
    import __spark_entry__ as entrymod

    # must not raise (ANSI divide-by-zero etc.); NULL metrics are fine
    entrymod.queries()[key](spark, constant_star).collect()


# -- degenerate documents / embeddings ----------------------------------------------
#
# The docs-side analogue: EMPTY and whitespace-only documents (zero
# tokens / zero chars) and ALL-ZERO embeddings (no direction — a real
# upstream-encoder failure mode).  The round-9 sweep found 22 latent
# ANSI DIVIDE_BY_ZERO crashes here (zero-norm cosine through the
# shared cosine_from_fixed helper, the int8 quantization scale, the
# quality-score template, centroid scores, frame sampling on empty
# payloads); every t_/d_/s_/p_/m_ key must now RUN.


@pytest.fixture(scope="module")
def degenerate_corpus(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("degenerate_corpus")

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).write.mode(
            "overwrite"
        ).parquet(str(tmp / f"{name}.parquet"))

    docs = [(i, "same same same", "en", "src0", 14) for i in range(30)]
    docs.append((30, "", "en", "src0", 0))          # EMPTY text
    docs.append((31, "   ", "en", "src0", 3))       # whitespace-only
    w(
        "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    emb = [(i, [0.0] * 64, 0) for i in range(40)]   # zero-norm vectors
    emb += [(40, [1.0] * 64, 1), (41, [1.0] * 64, 1)]
    w("embeddings", emb, "vec_id long, embedding array<float>, label int")
    return str(tmp)


def _corpus_keys():
    import __spark_entry__ as entrymod

    return [
        k
        for k in entrymod.queries()
        if k.split("_")[0] in ("t", "d", "s", "p", "m")
    ]


@pytest.mark.parametrize("key", _corpus_keys())
def test_degenerate_corpus_does_not_crash(spark, degenerate_corpus, key):
    import __spark_entry__ as entrymod

    entrymod.queries()[key](spark, degenerate_corpus).collect()
