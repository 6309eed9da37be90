"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship query; ``queries`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql`` provides the DuckDB twin for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from locopy_spark.queries import docs, events, tpch


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "q1_pricing_summary": tpch.q1_pricing_summary,
        "q3_top_unshipped": tpch.q3_top_unshipped,
        "q5_region_volume": tpch.q5_region_volume,
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q10_returned_items": tpch.q10_returned_items,
        "q14_promo_revenue": tpch.q14_promo_revenue,
        "q18_large_orders": tpch.q18_large_orders,
        "q_topk_per_group": tpch.q_topk_per_group,
        "q_mktseg_pivot": tpch.q_mktseg_pivot,
        "q_rollup_sales": tpch.q_rollup_sales,
        "q_distinct_counts": tpch.q_distinct_counts,
        "q_approx_distinct": tpch.q_approx_distinct,
        "q_events_window": events.q_events_window,
        "q_events_sessionize": events.q_events_sessionize,
        "q_events_json_props": events.q_events_json_props,
        "q_events_funnel": events.q_events_funnel,
        "q_orders_asof_events": events.q_orders_asof_events,
        "d_exact_dedup": docs.d_exact_dedup,
        "d_ngram_jaccard": docs.d_ngram_jaccard,
        "d_minhash_lsh": docs.d_minhash_lsh,
        "d_simhash": docs.d_simhash,
        "d_embedding_dedup": docs.d_embedding_dedup,
        "s_knn_bruteforce": docs.s_knn_bruteforce,
        "s_knn_lsh": docs.s_knn_lsh,
        "t_lang_id": docs.t_lang_id,
        "t_quality_score": docs.t_quality_score,
        "t_token_count": docs.t_token_count,
        "t_fingerprint": docs.t_fingerprint,
        "m_multimodal_meta": docs.m_multimodal_meta,
    }
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for each oracle-checkable query."""
    return {**tpch.ORACLE, **events.ORACLE, **docs.ORACLE}
