"""Text-quality and data-quality audit operators.

The locopy reference loads data and leaves validation to the analyst
(reference: locopy/redshift.py:235 ``copy`` returns after the load;
tests/test_integration.py checks row counts by hand); here the engine
IS the warehouse, so the post-load audits become first-class
operators: a Coleman–Liau readability profile and a type–token-ratio
lexical-diversity profile over the documents corpus (per-source
quality screens for a training-data pipeline), the sequential
quality-gate survival funnel a corpus-cleaning run reports, and a
declared-expectation data-quality audit over the relational tables
(the Great-Expectations-style rule table).

Exactness (SURVEY §4): every count is an exact integer; ratios are
scaled-integer floor divisions through the shared ``_signed_ratio``
device where a numerator can go negative (Spark ``div`` truncates,
DuckDB ``//`` floors — they agree only on non-negative operands); no
doubles anywhere in this module's outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from locopy_spark.queries.trends import _signed_ratio
from locopy_spark.functions.text import sql_tokens, tokens_expr, top_freq_expr
from locopy_spark.sources.tables import load_table

ORACLE: dict[str, str] = {}


# -- Coleman–Liau readability profile ---------------------------------------

# CLI = 0.0588·L − 0.296·S − 15.8, L = letters per 100 words, S =
# sentences per 100 words. In exact centi-points over integer counts:
#   cli_centi = (588·letters − 2960·sentences) div words − 1580
# Sentences floor at 1 (this corpus has no terminal punctuation at
# all — measured, not assumed — and a 0 sentence count would zero the
# S term rather than divide by zero anyway; the floor keeps the
# formula the textbook one on punctuated corpora).
_CLI_BAND_LO = 0
_CLI_BAND_HI = 3000  # clamp in centi-points → bands 0..30


def t_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Coleman–Liau readability histogram over documents —
    the grade-level screen a corpus-quality pipeline runs next to
    t_quality_score (which mixes lengths/stopwords but has no
    notion of grade level).

    Coleman–Liau needs only letter/word/sentence COUNTS (no syllable
    heuristics — that is why it is the exact-arithmetic choice among
    readability indices): the score closes as one scaled-integer
    floor division per document, entirely row-local codegen, and the
    only shuffle is the |sources × 31|-bounded histogram aggregate.
    Negative numerators route through the ``_signed_ratio`` device;
    the band id clamps to [0, 30] BEFORE its ``div 100`` so the
    operands stay non-negative (engine-identical truncation).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr("text")
    num = (
        "(588 * length(regexp_replace(lower(trim(text)), '[^a-z]', ''))"
        " - 2960 * greatest(1, cast(regexp_count(text, '[.!?]') as bigint)))"
    )
    cli = f"({_signed_ratio(num, f'size({toks})', 1, 'div')} - 1580)"
    band = (
        f"greatest({_CLI_BAND_LO}, least({_CLI_BAND_HI}, {cli})) div 100"
    )
    return (
        # Zero-token documents would NULL the word-count divisor and
        # surface a NULL-keyed band row; readability of an empty
        # document is undefined, so drop them up front.
        docs.where(F.expr(f"size({toks}) > 0"))
        .select("source", F.expr(f"cast({band} as bigint)").alias("band"))
        .groupBy("source", "band")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "band")
    )


def _sql_readability() -> str:
    toks = sql_tokens("text")
    num = (
        "(588 * length(regexp_replace(lower(trim(text)), '[^a-z]', '', 'g'))"
        " - 2960 * greatest(1, len(regexp_extract_all(text, '[.!?]'))))"
    )
    cli = f"({_signed_ratio(num, f'len({toks})', 1, '//')} - 1580)"
    band = f"greatest({_CLI_BAND_LO}, least({_CLI_BAND_HI}, {cli})) // 100"
    return f"""
  SELECT source, CAST({band} AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents WHERE len({toks}) > 0
  GROUP BY 1, 2 ORDER BY source, band
"""


ORACLE["t_readability"] = _sql_readability()


# -- type–token ratio (lexical diversity) -----------------------------------


def t_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source type–token-ratio decile histogram — the lexical-
    diversity screen (repetitive/templated text scores low TTR even
    when t_repetition's n-gram device misses it because the repeats
    are shuffled rather than contiguous).

    TTR closes per document as an exact ppm ratio of row-local array
    ops (array_distinct / size — no shuffle touches token data); the
    decile id is a second non-negative floor division. One bounded
    |sources × 10| aggregate after a row-local projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_expr("text")
    ttr = (
        f"(cast(size(array_distinct({toks})) as bigint) * 1000000"
        f" div size({toks}))"
    )
    return (
        # Empty/whitespace-only documents have size(tokens)=0 — the
        # ratio would NULL and surface a NULL-keyed decile row; they
        # carry no lexical-diversity signal, so drop them up front.
        docs.where(F.expr(f"size({toks}) > 0"))
        .select(
            "source",
            F.expr(f"cast(least(9, {ttr} div 100000) as bigint)").alias(
                "decile"
            ),
        )
        .groupBy("source", "decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "decile")
    )


def _sql_ttr() -> str:
    toks = sql_tokens("text")
    ttr = f"(len(list_distinct({toks})) * 1000000 // len({toks}))"
    return f"""
  SELECT source, CAST(LEAST(9, {ttr} // 100000) AS BIGINT) AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM documents WHERE len({toks}) > 0
  GROUP BY 1, 2 ORDER BY source, decile
"""


ORACLE["t_ttr"] = _sql_ttr()


# -- sequential quality-gate survival funnel --------------------------------

# Gate thresholds (calibrated against the corpus so every stage is
# informative at gate SFs: ~18% fall at min_chars, ~20% more at
# min_tokens, then the two lexical screens each bite):
FUNNEL_MIN_CHARS = 150
FUNNEL_MIN_TOKENS = 40
FUNNEL_MIN_TTR_PPM = 350_000
FUNNEL_MAX_DOM_PPM = 120_000

_FUNNEL_STAGES = (
    "ingest",
    "min_chars",
    "min_tokens",
    "lexical_diversity",
    "max_dominance",
)


def p_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-cleaning survival funnel: how many documents (and
    how many tokens of trainable text) survive each successive
    quality gate — the one-table report every filtering run publishes
    before anyone trains on its output.

    Gates: minimum characters → minimum tokens → minimum type–token
    ratio → maximum single-token dominance (the share of the most
    frequent token; templated spam passes TTR but fails dominance).
    All four predicates are row-local array/regexp codegen over one
    scan; the cumulative-AND sums reduce to ONE 10-counter row
    (additive monoid — stream_filter_funnel merges per-batch rows by
    plain summation), unpivoted to the 5-stage report. Token data
    never shuffles; the funnel costs one pass at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    return funnel_report(funnel_counts(docs))


def funnel_counts(docs: DataFrame) -> DataFrame:
    """The 1-row additive funnel state: doc/token counts surviving
    each cumulative gate prefix."""
    # project the token array ONCE (r11): the inlined form re-ran the
    # split per metric — and inside the dominance lambda, once per
    # distinct token — and the dominance count itself was O(d x n);
    # top_freq_expr is the bit-identical sorted-run-max form
    per_doc = docs.select(
        "n_chars", F.expr(tokens_expr("text")).alias("toks")
    ).select(
        F.col("n_chars"),
        F.expr("cast(size(toks) as bigint)").alias("tok"),
        F.expr(
            "cast(size(array_distinct(toks)) as bigint) * 1000000"
        ).alias("dst_sc"),
        F.expr(
            f"cast({top_freq_expr('toks')} as bigint) * 1000000"
        ).alias("dom_sc"),
    ).select(
        # tok=0 makes g3/g4 NULL (zero divisor on both engines), but
        # every consumer conjoins them with g2 (tok >= MIN_TOKENS, so
        # false at tok=0) and `NULL AND false` is false — the NULL
        # never reaches a counter. Do not use g3/g4 unconjoined.
        "tok",
        F.expr(f"n_chars >= {FUNNEL_MIN_CHARS}").alias("g1"),
        F.expr(f"tok >= {FUNNEL_MIN_TOKENS}").alias("g2"),
        F.expr(f"dst_sc div tok >= {FUNNEL_MIN_TTR_PPM}").alias("g3"),
        F.expr(f"dom_sc div tok <= {FUNNEL_MAX_DOM_PPM}").alias("g4"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n0"),
        F.sum("tok").alias("tok0"),
    ]
    conds = ["g1", "g1 and g2", "g1 and g2 and g3", "g1 and g2 and g3 and g4"]
    for i, c in enumerate(conds, start=1):
        aggs.append(
            F.sum(F.expr(f"case when {c} then 1 else 0 end")).alias(f"n{i}")
        )
        aggs.append(
            F.sum(F.expr(f"case when {c} then tok else 0 end")).alias(
                f"tok{i}"
            )
        )
    return per_doc.agg(*aggs)


def funnel_report(state: DataFrame) -> DataFrame:
    """Unpivot the 1-row funnel state to the 5-stage report."""
    cells = ", ".join(
        f"{i}, '{name}', n{i}, tok{i}"
        for i, name in enumerate(_FUNNEL_STAGES)
    )
    return state.selectExpr(
        f"stack(5, {cells}) as (stage, gate, docs, tokens)"
    ).selectExpr(
        "cast(stage as bigint) as stage", "gate", "docs", "tokens"
    ).orderBy("stage")


def _sql_funnel() -> str:
    toks = sql_tokens("text")
    dom = (
        f"list_max(list_transform(list_distinct({toks}),"
        f" d -> len(list_filter({toks}, t -> t = d)))) * 1000000"
    )
    stage_rows = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS stage, '{name}' AS gate,"
        f" CAST(n{i} AS BIGINT) AS docs, CAST(tok{i} AS BIGINT) AS tokens"
        " FROM s"
        for i, name in enumerate(_FUNNEL_STAGES)
    )
    return f"""
  WITH d AS (
    SELECT len({toks}) AS tok,
           n_chars >= {FUNNEL_MIN_CHARS} AS g1,
           len({toks}) >= {FUNNEL_MIN_TOKENS} AS g2,
           len(list_distinct({toks})) * 1000000 // len({toks})
             >= {FUNNEL_MIN_TTR_PPM} AS g3,
           {dom} // len({toks}) <= {FUNNEL_MAX_DOM_PPM} AS g4
    FROM documents
  ),
  s AS (
    SELECT COUNT(*) AS n0, SUM(tok) AS tok0,
           SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS n1,
           SUM(CASE WHEN g1 THEN tok ELSE 0 END) AS tok1,
           SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS n2,
           SUM(CASE WHEN g1 AND g2 THEN tok ELSE 0 END) AS tok2,
           SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS n3,
           SUM(CASE WHEN g1 AND g2 AND g3 THEN tok ELSE 0 END) AS tok3,
           SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS n4,
           SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN tok ELSE 0 END) AS tok4
    FROM d
  )
  SELECT * FROM ({stage_rows}) ORDER BY stage
"""


ORACLE["p_filter_funnel"] = _sql_funnel()


# -- declared-expectation data-quality audit --------------------------------

# (rule_id, table, n-source, violation predicate). A row VIOLATES when
# the predicate is true OR any referenced column is NULL (counted via
# CASE WHEN <ok-cond> THEN 0 ELSE 1 — NULL conditions fall to ELSE).
_DQ_ORDER_RULES = (
    ("orders.totalprice_positive", "o_totalprice > 0"),
    (
        "orders.orderdate_tpch_range",
        "cast(o_orderdate as date) <= date '1998-12-31'",
    ),
    ("orders.status_domain", "o_orderstatus in ('O', 'F', 'P')"),
)
_DQ_LINE_RULES = (
    ("lineitem.discount_0_to_10pct", "l_discount >= 0 and l_discount <= 0.1"),
    ("lineitem.quantity_1_to_50", "l_quantity >= 1 and l_quantity <= 50"),
    ("lineitem.tax_0_to_8pct", "l_tax >= 0 and l_tax <= 0.08"),
)
_DQ_SHIP_RULE = ("lineitem.ship_on_or_after_order", "l_shipdate >= o_orderdate")


def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-expectation data-quality audit over the relational
    tables — the rule table a load pipeline publishes after COPY
    lands (the validation step the reference leaves to analyst SQL):
    each rule reports rows checked, rows failed, and an exact ppm
    failure rate.

    Domain rules compile to CASE sums inside ONE partial-aggregated
    scan per table (no shuffle carries row data — each scan reduces
    to a single counter row). The one cross-table rule
    (ship_on_or_after_order) is a co-partitioned equi-join on the
    order key — the only shuffle, both sides keyed. NULLs in any
    referenced column count as violations (CASE falls through), so
    the audit cannot silently pass on missing data. Note the audit is
    HONEST about this warehouse: orderdate_tpch_range genuinely fails
    here (the synthetic calendar runs past 1998) and
    ship_on_or_after_order catches real inversions — declared
    expectations vs observed data, not tautologies.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def audit_rows(df: DataFrame, rules) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n")]
        for i, (_, cond) in enumerate(rules):
            aggs.append(
                F.sum(
                    F.expr(f"case when {cond} then 0 else 1 end")
                ).alias(f"f{i}")
            )
        row = df.agg(*aggs)
        cells = ", ".join(
            f"'{rid}', n, f{i}" for i, (rid, _) in enumerate(rules)
        )
        return row.selectExpr(
            f"stack({len(rules)}, {cells})"
            " as (rule, n_checked, n_failed)"
        )

    ship = (
        li.select("l_orderkey", "l_shipdate")
        .join(
            o.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == o.o_orderkey,
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.expr(
                    f"case when {_DQ_SHIP_RULE[1]} then 0 else 1 end"
                )
            ).alias("f0"),
        )
        .selectExpr(
            f"'{_DQ_SHIP_RULE[0]}' as rule",
            "n as n_checked",
            "f0 as n_failed",
        )
    )
    out = (
        audit_rows(o, _DQ_ORDER_RULES)
        .unionByName(audit_rows(li, _DQ_LINE_RULES))
        .unionByName(ship)
    )
    return out.selectExpr(
        "rule",
        "n_checked",
        "n_failed",
        "n_failed * 1000000 div n_checked as fail_ppm",
    ).orderBy("rule")


def _sql_dq() -> str:
    def block(table: str, rules) -> tuple[str, str]:
        fails = ",\n           ".join(
            f"SUM(CASE WHEN {cond} THEN 0 ELSE 1 END) AS f{i}"
            for i, (_, cond) in enumerate(rules)
        )
        rows = "\n    UNION ALL ".join(
            f"SELECT '{rid}' AS rule, n AS n_checked,"
            f" f{i} AS n_failed FROM {table}_s"
            for i, (rid, _) in enumerate(rules)
        )
        return (
            f"{table}_s AS (\n    SELECT COUNT(*) AS n,\n"
            f"           {fails}\n    FROM {table}\n  )",
            rows,
        )

    o_cte, o_rows = block("orders", _DQ_ORDER_RULES)
    li_cte, li_rows = block("lineitem", _DQ_LINE_RULES)
    return f"""
  WITH {o_cte},
  {li_cte},
  ship_s AS (
    SELECT COUNT(*) AS n,
           SUM(CASE WHEN {_DQ_SHIP_RULE[1]} THEN 0 ELSE 1 END) AS f0
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  ),
  allrules AS (
    {o_rows}
    UNION ALL {li_rows}
    UNION ALL SELECT '{_DQ_SHIP_RULE[0]}' AS rule, n AS n_checked,
              f0 AS n_failed FROM ship_s
  )
  SELECT rule, CAST(n_checked AS BIGINT) AS n_checked,
         CAST(n_failed AS BIGINT) AS n_failed,
         CAST(n_failed * 1000000 // n_checked AS BIGINT) AS fail_ppm
  FROM allrules ORDER BY rule
"""


ORACLE["q_dq_audit"] = _sql_dq()


# -- partition-layout advisor ------------------------------------------------

# Advisory thresholds: a partition column wants enough values to
# parallelize (> PART_MIN), few enough that files stay chunky
# (< PART_MAX), and balanced enough that one partition doesn't own
# the job (max/avg below PART_SKEW ppm).
PART_MIN_VALUES = 8
PART_MAX_VALUES = 10_000
PART_SKEW_PPM = 3_000_000  # max partition > 3x the average

_PART_VERDICT = (
    f"CASE WHEN n_values < {PART_MIN_VALUES} THEN 'too_coarse'"
    f" WHEN n_values > {PART_MAX_VALUES} THEN 'too_fine'"
    f" WHEN skew_ppm > {PART_SKEW_PPM} THEN 'skewed'"
    " ELSE 'ok' END"
)


def q_partition_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column advisory for the write path: for each
    candidate partition key, the value count, total/max partition
    rows, an exact max-vs-average skew ratio (ppm) and a verdict
    (too_coarse / too_fine / skewed / ok) — the physical-design
    audit a locopy user runs before `partitionBy` on an UNLOAD (the
    layout decision z-order + compact_parquet then implement, see
    sources/layout.py).

    Scale shape: ONE grouping-sets scan per table (Catalyst expands
    all candidate groupings into a single shuffle — the
    q_grouping_sets device), so adding a candidate column costs an
    Expand row, not a rescan; the per-candidate rollup runs over the
    |values| aggregate. Skew closes as an exact ppm through
    DECIMAL(38) products.
    """
    from locopy_spark.functions.numeric import sql_epoch_day

    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    o.select(
        F.expr(
            "cast(year(o_orderdate) * 12 + month(o_orderdate) as bigint)"
        ).alias("om"),
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_custkey").alias("ck"),
    ).createOrReplaceTempView("_pa_orders")
    e.select(
        F.col("event_type").alias("et"),
        F.expr(f"({sql_epoch_day(e, 'ts')})").alias("ed"),
    ).createOrReplaceTempView("_pa_events")
    per_value = spark.sql(
        """
        SELECT CASE WHEN GROUPING(om) = 0 THEN 'orders.order_month'
                    WHEN GROUPING(pri) = 0 THEN 'orders.o_orderpriority'
                    WHEN GROUPING(st) = 0 THEN 'orders.o_orderstatus'
                    ELSE 'orders.o_custkey' END AS candidate,
               COUNT(*) AS cnt
        FROM _pa_orders
        GROUP BY GROUPING SETS ((om), (pri), (st), (ck))
        UNION ALL
        SELECT CASE WHEN GROUPING(et) = 0 THEN 'events.event_type'
                    ELSE 'events.event_day' END AS candidate,
               COUNT(*) AS cnt
        FROM _pa_events
        GROUP BY GROUPING SETS ((et), (ed))
        """
    )
    return (
        per_value.groupBy("candidate")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_rows"),
        )
        .selectExpr(
            "candidate",
            "n_values",
            "total_rows",
            "max_rows",
            "cast(cast(max_rows as decimal(38,0)) * n_values * 1000000"
            " div total_rows as bigint) as skew_ppm",
        )
        .selectExpr("*", f"{_PART_VERDICT} as verdict")
        .orderBy("candidate")
    )


def _sql_partition_advisor() -> str:
    def cand(name: str, expr: str, table: str) -> str:
        return f"""
    SELECT '{name}' AS candidate,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_rows
    FROM (SELECT {expr} AS v, COUNT(*) AS cnt FROM {table} GROUP BY 1)"""

    cands = "\n    UNION ALL".join(
        [
            cand(
                "orders.order_month",
                "year(o_orderdate) * 12 + month(o_orderdate)",
                "orders",
            ),
            cand("orders.o_orderpriority", "o_orderpriority", "orders"),
            cand("orders.o_orderstatus", "o_orderstatus", "orders"),
            cand("orders.o_custkey", "o_custkey", "orders"),
            cand("events.event_type", "event_type", "events"),
            cand(
                "events.event_day",
                "datediff('day', DATE '1970-01-01', CAST(ts AS DATE))",
                "events",
            ),
        ]
    )
    return f"""
  WITH g AS ({cands})
  SELECT candidate, n_values, total_rows, max_rows,
         CAST(CAST(max_rows AS HUGEINT) * n_values * 1000000
              // total_rows AS BIGINT) AS skew_ppm,
         {_PART_VERDICT.replace("skew_ppm", "(CAST(max_rows AS HUGEINT) * n_values * 1000000 // total_rows)")} AS verdict
  FROM g ORDER BY candidate
"""


ORACLE["q_partition_advisor"] = _sql_partition_advisor()
