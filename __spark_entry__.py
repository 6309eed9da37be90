"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship query; ``queries`` maps every
implemented operator from SURVEY.md §2 to a (spark, sf_dir) callable;
``oracle_sql`` provides the DuckDB twin for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from locopy_spark.queries import (
    assoc,
    corpus,
    docs,
    docs_ext,
    etl_ext,
    events,
    events_ext,
    io_rt,
    mining,
    quality,
    stats,
    timeseries,
    tpch,
    tpch_ext,
    trends,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    return tpch.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordering note: the driver's correctness gate covers the first 50
    entries, so the window rotates each round.  Round 8 leads with the
    THIRTEEN round-7-late entries that have never had a driver
    correctness row (s_centroid_assign … q_type_overlap), then
    q_except_customers (displaced from round 7's slot 50 by the
    lockstep rule), then the r1-era block (last checked round 1 under
    Spark 3), then four r4-era streaming-twin batch pairs (so no
    lockstep chain rests on a 4-round-old row), then the stalest
    r3-era docs/text greens.  The cutoff (position 50) is marked
    below; everything past it is driver-green from rounds 1-7 and
    re-verified by the repo's own full DuckDB gate at sf0.001 inside
    every green pytest run.  Round-8 additions land INSIDE the window
    (displacing tail re-checks toward round 9) so new surface gets a
    first-exposure driver row immediately; tools/check_survey.py now
    asserts structurally that every never-driver-checked key sits
    inside the window.
    """
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # --- ROUND-8 WINDOW slots 1-13: the 13 round-7-late entries
        # that have never had a driver correctness row (each
        # pre-flighted green at sf0.001/0.01/0.1 on landing and
        # re-pre-flighted this round; t_vocab_growth carries the
        # ADVICE-r7 empty-checkpoint left-join fix) ---
        "s_centroid_assign": docs_ext.s_centroid_assign,
        "q_fulfillment_lag": tpch_ext.q_fulfillment_lag,
        "t_vocab_growth": corpus.t_vocab_growth,
        "q_peak_days": timeseries.q_peak_days,
        "q_seasonal_strength": stats.q_seasonal_strength,
        "s_silhouette": docs_ext.s_silhouette,
        "q_value_migration": tpch_ext.q_value_migration,
        "q_street_vs_list": tpch_ext.q_street_vs_list,
        "q_basket_size_dist": tpch.q_basket_size_dist,
        "q_revenue_bridge": tpch_ext.q_revenue_bridge,
        "q_drawdown": timeseries.q_drawdown,
        "t_source_overlap": corpus.t_source_overlap,
        "q_type_overlap": events_ext.q_type_overlap,
        # --- slot 14: q_except_customers — the r1-era re-check
        # displaced from the round-7 window's slot 50 by the
        # lockstep rule ---
        # --- r1-era block, last driver-checked round 1 under
        # Spark 3 (tail members displaced to round 9 by late round-8
        # additions) ---
        # --- slots 22-25: stale streaming-twin batch pairs — the
        # r4-era batch twins of long-running streaming jobs
        # (stream_window_agg / stream_sessionize / stream_incr_rollup
        # / stream_cdc_apply), re-checked so no lockstep chain rests
        # on a 4-round-old row (VERDICT r7 task 5) ---
        "q_events_window": events.q_events_window,
        "q_events_sessionize": events.q_events_sessionize,
        "q_incr_rollup": events_ext.q_incr_rollup,
        "q_cdc_apply": etl_ext.q_cdc_apply,
        # --- round-8 additions: new surface gets its first driver row
        # immediately (first-exposure rule; each displaces one r3-era
        # tail re-check past the cutoff) ---
        "q_goodman_lambda": assoc.q_goodman_lambda,
        "q_price_index": tpch_ext.q_price_index,
        "q_stickiness": timeseries.q_stickiness,
        "q_changepoint": timeseries.q_changepoint,
        "q_levene": stats.q_levene,
        "s_kappa": docs_ext.s_kappa,
        "s_ndcg_eval": docs_ext.s_ndcg_eval,
        "q_abc_xyz": tpch_ext.q_abc_xyz,
        "q_odds_ratio": tpch_ext.q_odds_ratio,
        "q_attribution_markov": events_ext.q_attribution_markov,
        "m_payload_dedup": docs_ext.m_payload_dedup,
        "q_attribution_decay": events_ext.q_attribution_decay,
        "q_xmr_control": timeseries.q_xmr_control,
        "q_brand_xcorr": stats.q_brand_xcorr,
        "q_croston": tpch_ext.q_croston,
        "q_demand_obsolete": tpch_ext.q_demand_obsolete,
        "q_bollinger": timeseries.q_bollinger,
        "q_rsi": timeseries.q_rsi,
        "q_newsvendor": tpch_ext.q_newsvendor,
        "q_jaccard_links": mining.q_jaccard_links,
        "q_little_law": tpch_ext.q_little_law,
        "q_supplier_leadtime": tpch_ext.q_supplier_leadtime,
        "q_mase": timeseries.q_mase,
        "q_logrank": assoc.q_logrank,
        "q_ship_sla": tpch_ext.q_ship_sla,
        "q_friedman": stats.q_friedman,
        "q_clustering_coef": mining.q_clustering_coef,
        "q_mcnemar": trends.q_mcnemar,
        "q_price_dispersion": tpch_ext.q_price_dispersion,
        "q_growth_accounting": timeseries.q_growth_accounting,
        "q_did": trends.q_did,
        "q_cliffs_delta": stats.q_cliffs_delta,
        "q_capture_recapture": trends.q_capture_recapture,
        # ------- position 50 cutoff: window ends above this line -------
        # --- displaced to round 9 by late round-8 additions (the
        # window is finite; every key below is still re-verified by
        # the in-repo DuckDB gate at sf0.001 inside each pytest run) ---
        "q_except_customers": tpch_ext.q_except_customers,
        "q_stats_moments": tpch_ext.q_stats_moments,
        "q_value_deciles": tpch_ext.q_value_deciles,
        "q_grouping_sets": tpch_ext.q_grouping_sets,
        "q_intersect_customers": tpch_ext.q_intersect_customers,
        "q_dow_revenue": tpch_ext.q_dow_revenue,
        "q_hash_sample": tpch_ext.q_hash_sample,
        "q_unpivot_metrics": tpch_ext.q_unpivot_metrics,
        # --- remaining slots: the stalest r3-era docs/text greens
        # (last checked round 3, some pre-Spark-4) ---
        "d_exact_dedup": docs.d_exact_dedup,
        "d_ngram_jaccard": docs.d_ngram_jaccard,
        "d_minhash_lsh": docs.d_minhash_lsh,
        "d_simhash": docs.d_simhash,
        "d_embedding_dedup": docs.d_embedding_dedup,
        "d_dup_clusters": docs_ext.d_dup_clusters,
        "d_hash_split": docs_ext.d_hash_split,
        "d_balanced_sample": docs_ext.d_balanced_sample,
        "d_source_dedup": docs_ext.d_source_dedup,
        "d_contamination": docs_ext.d_contamination,
        "d_edit_verify": docs_ext.d_edit_verify,
        "s_knn_bruteforce": docs.s_knn_bruteforce,
        "s_knn_lsh": docs.s_knn_lsh,
        "s_knn_ivf": docs_ext.s_knn_ivf,
        "s_tfidf_pairs": docs_ext.s_tfidf_pairs,
        "s_kmeans": docs_ext.s_kmeans,
        "t_lang_id": docs.t_lang_id,
        "t_quality_score": docs.t_quality_score,
        "t_token_count": docs.t_token_count,
        "t_fingerprint": docs.t_fingerprint,
        "t_quality_filter": docs_ext.t_quality_filter,
        "t_pii_scrub": docs_ext.t_pii_scrub,
        "t_term_stats": docs_ext.t_term_stats,
        "t_ngram_top": docs_ext.t_ngram_top,
        "t_doc_chunks": docs_ext.t_doc_chunks,
        # everything below is driver-green from earlier rounds and
        # re-verified by the repo's own full DuckDB gate
        # (tools/check_correctness.py) at sf0.001 inside every green
        # pytest run (tests/test_correctness_gate.py)
        "q_kaplan_meier": assoc.q_kaplan_meier,
        "q_kruskal_wallis": assoc.q_kruskal_wallis,
        "q_new_vs_returning": tpch_ext.q_new_vs_returning,
        "q_degree_dist": mining.q_degree_dist,
        "t_code_detect": docs_ext.t_code_detect,
        "t_boilerplate": docs_ext.t_boilerplate,
        "q_pattern_negation": events_ext.q_pattern_negation,
        "q_kcore": mining.q_kcore,
        "s_rrf_fusion": docs_ext.s_rrf_fusion,
        "s_mmr_diversify": docs_ext.s_mmr_diversify,
        "q_sessions_concurrent": events_ext.q_sessions_concurrent,
        "s_prf_expand": docs_ext.s_prf_expand,
        "q_time_to_convert": events_ext.q_time_to_convert,
        "q_conversion_curve": events_ext.q_conversion_curve,
        "q_co_engagement": events_ext.q_co_engagement,
        "p_dedup_yield": corpus.p_dedup_yield,
        "q_cochran_armitage": trends.q_cochran_armitage,
        "q_discount_elasticity": trends.q_discount_elasticity,
        "t_readability": quality.t_readability,
        "t_ttr": quality.t_ttr,
        "p_filter_funnel": quality.p_filter_funnel,
        "q_dq_audit": quality.q_dq_audit,
        "q_lpa_communities": mining.q_lpa_communities,
        "s_centroid_purity": docs_ext.s_centroid_purity,
        "q_session_gap_curve": events_ext.q_session_gap_curve,
        "p_interleave_eval": corpus.p_interleave_eval,
        "q_mix_drift": trends.q_mix_drift,
        "q_partition_advisor": quality.q_partition_advisor,
        "p_resume_plan": corpus.p_resume_plan,
        "t_simpson_diversity": corpus.t_simpson_diversity,
        "t_zipf_deviation": corpus.t_zipf_deviation,
        "q_burstiness": timeseries.q_burstiness,
        "t_hapax_ratio": corpus.t_hapax_ratio,
        "d_norm_histogram": docs_ext.d_norm_histogram,
        "q_calendar_heatmap": timeseries.q_calendar_heatmap,
        "s_hubness": docs_ext.s_hubness,
        "q_dormancy_curve": timeseries.q_dormancy_curve,
        "d_embedding_centroids": docs_ext.d_embedding_centroids,
        "p_train_order": corpus.p_train_order,
        "t_cms_counts": corpus.t_cms_counts,
        "q_copy_csv": io_rt.q_copy_csv,
        "q_unload_roundtrip": io_rt.q_unload_roundtrip,
        "q_nelson_aalen": assoc.q_nelson_aalen,
        "q_lorenz_curve": stats.q_lorenz_curve,
        "q_anova": stats.q_anova,
        "s_mrr_eval": docs_ext.s_mrr_eval,
        "q_markov_stationary": events_ext.q_markov_stationary,
        "q_gini": stats.q_gini,
        "q_event_transitions": events_ext.q_event_transitions,
        "q_backlog_aging": tpch_ext.q_backlog_aging,
        "s_mips": docs.s_mips,
        "p_length_histogram": corpus.p_length_histogram,
        "p_curriculum_stages": corpus.p_curriculum_stages,
        "d_cluster_stats": docs_ext.d_cluster_stats,
        "p_tokenizer_fertility": corpus.p_tokenizer_fertility,
        "s_ivf_tuning": docs_ext.s_ivf_tuning,
        "q_fuzzy_match": tpch_ext.q_fuzzy_match,
        "t_freq_drift": docs_ext.t_freq_drift,
        "d_embedding_moments": docs_ext.d_embedding_moments,
        "q_attribution_linear": events_ext.q_attribution_linear,
        "q_bloom_semijoin": tpch_ext.q_bloom_semijoin,
        "d_dedup_keep_best": docs_ext.d_dedup_keep_best,
        "t_langid_confusion": docs_ext.t_langid_confusion,
        "q_rfm_segmentation": tpch_ext.q_rfm_segmentation,
        "d_source_syndication": docs_ext.d_source_syndication,
        "d_pps_sample": corpus.d_pps_sample,
        "q_cohort_ltv": events_ext.q_cohort_ltv,
        "q_ols_trend": trends.q_ols_trend,
        "q_holt_linear": trends.q_holt_linear,
        "q_theil_sen": trends.q_theil_sen,
        "q_benford": trends.q_benford,
        "q_graph_reach": mining.q_graph_reach,
        "p_dataset_card": corpus.p_dataset_card,
        "q_winsorized": stats.q_winsorized,
        "s_pq_knn": docs_ext.s_pq_knn,
        "d_prefix_join": docs_ext.d_prefix_join,
        "q_decile_lift": stats.q_decile_lift,
        "q_holt_winters": trends.q_holt_winters,
        "q_weighted_quantiles": stats.q_weighted_quantiles,
        "q_ks_test": stats.q_ks_test,
        "q_mann_whitney": stats.q_mann_whitney,
        "q_spearman": stats.q_spearman,
        "q_wilcoxon": stats.q_wilcoxon,
        "q_autocorr": stats.q_autocorr,
        "q_runs_test": stats.q_runs_test,
        "q_assortativity": mining.q_assortativity,
        "q_pareto_abc": tpch_ext.q_pareto_abc,
        "q_top_paths": events_ext.q_top_paths,
        "q_xcorr": events_ext.q_xcorr,
        "p_seqlen_plan": docs_ext.p_seqlen_plan,
        "p_vocab_coverage": corpus.p_vocab_coverage,
        "q_weekday_uplift": tpch_ext.q_weekday_uplift,
        "q_interpurchase": events_ext.q_interpurchase,
        "q_mann_kendall": assoc.q_mann_kendall,
        "q_kendall_tau": assoc.q_kendall_tau,
        "q_cramers_v": assoc.q_cramers_v,
        "q_hhi": assoc.q_hhi,
        "q_seasonal_decompose": trends.q_seasonal_decompose,
        "q_key_skew": tpch_ext.q_key_skew,
        "m_multimodal_meta": docs.m_multimodal_meta,
        "m_frame_sample": docs_ext.m_frame_sample,
        "m_feature_extract": docs_ext.m_feature_extract,
        "m_resize": docs_ext.m_resize,
        "p_clean_corpus": docs_ext.p_clean_corpus,
        "t_repetition": docs_ext.t_repetition,
        "s_knn_int8": docs_ext.s_knn_int8,
        "p_mix_weights": docs_ext.p_mix_weights,
        "p_pack_sequences": docs_ext.p_pack_sequences,
        "t_unigram_rarity": docs_ext.t_unigram_rarity,
        "q_events_json_props": events.q_events_json_props,
        "q_approx_distinct": tpch.q_approx_distinct,
        "q_approx_percentiles": events_ext.q_approx_percentiles,
        "q_window_funcs": tpch_ext.q_window_funcs,
        "q_merge_upsert": etl_ext.q_merge_upsert,
        "q_scd2_history": etl_ext.q_scd2_history,
        "q_hll_union": mining.q_hll_union,
        "p_epoch_plan": mining.p_epoch_plan,
        "q_cusum": mining.q_cusum,
        "p_stratified_split": mining.p_stratified_split,
        "d_kmv_overlap": corpus.d_kmv_overlap,
        "q_incr_join_view": etl_ext.q_incr_join_view,
        "s_hard_negatives": docs.s_hard_negatives,
        "d_centroid_drift": docs_ext.d_centroid_drift,
        "q_graph_triangles": mining.q_graph_triangles,
        "q_exp_smooth": mining.q_exp_smooth,
        "q_pagerank": mining.q_pagerank,
        "p_budget_trim": corpus.p_budget_trim,
        "d_lsh_calibration": docs_ext.d_lsh_calibration,
        "q_mom_growth": mining.q_mom_growth,
        "q_anomaly_days": mining.q_anomaly_days,
        "q_snapshot_diff": etl_ext.q_snapshot_diff,
        "q_percentiles": events_ext.q_percentiles,
        "q_order_gaps": events_ext.q_order_gaps,
        "q_histogram": tpch_ext.q_histogram,
        "q1_pricing_summary": tpch.q1_pricing_summary,
        "q2_min_cost_supplier": tpch_ext.q2_min_cost_supplier,
        "q3_top_unshipped": tpch.q3_top_unshipped,
        "q4_order_priority": tpch_ext.q4_order_priority,
        "q5_region_volume": tpch.q5_region_volume,
        "q6_forecast_revenue": tpch.q6_forecast_revenue,
        "q7_nation_volume": tpch_ext.q7_nation_volume,
        "q8_market_share": tpch_ext.q8_market_share,
        "q9_product_profit": tpch_ext.q9_product_profit,
        "q10_returned_items": tpch.q10_returned_items,
        "q11_important_parts": tpch_ext.q11_important_parts,
        "q12_late_lines": tpch_ext.q12_late_lines,
        "q13_customer_orders": tpch_ext.q13_customer_orders,
        "q14_promo_revenue": tpch.q14_promo_revenue,
        "q15_top_supplier": tpch_ext.q15_top_supplier,
        "q16_supplier_cnt": tpch_ext.q16_supplier_cnt,
        "q17_small_quantity": tpch_ext.q17_small_quantity,
        "q18_large_orders": tpch.q18_large_orders,
        "q19_disjunctive": tpch_ext.q19_disjunctive,
        "q20_excess_suppliers": tpch_ext.q20_excess_suppliers,
        "q21_waiting_supplier": tpch_ext.q21_waiting_supplier,
        "q22_dormant_customers": tpch_ext.q22_dormant_customers,
        "q_topk_per_group": tpch.q_topk_per_group,
        "q_mktseg_pivot": tpch.q_mktseg_pivot,
        "q_rollup_sales": tpch.q_rollup_sales,
        "q_distinct_counts": tpch.q_distinct_counts,
        "q_running_total": tpch_ext.q_running_total,
        "q_moving_avg": tpch_ext.q_moving_avg,
        "q_cube_returns": tpch_ext.q_cube_returns,
        "q_events_funnel": events.q_events_funnel,
        "q_orders_asof_events": events.q_orders_asof_events,
        "q_retention_cohorts": events_ext.q_retention_cohorts,
        "q_range_join": events_ext.q_range_join,
        "q_events_json_typed": events_ext.q_events_json_typed,
        "t_bigram_pmi": docs_ext.t_bigram_pmi,
        "d_semantic_dedup": docs.d_semantic_dedup,
        "q_asof_nearest": events.q_asof_nearest,
        "p_dedup_corpus": docs_ext.p_dedup_corpus,
        "q_session_overlap": events_ext.q_session_overlap,
        "p_quality_mix_plan": docs_ext.p_quality_mix_plan,
        "d_incr_dedup": docs.d_incr_dedup,
        "q_trailing_window": events_ext.q_trailing_window,
        "q_resample_ohlc": timeseries.q_resample_ohlc,
        "q_gap_fill": timeseries.q_gap_fill,
        "q_hypertable_rollup": timeseries.q_hypertable_rollup,
        "p_sample_corpus": corpus.p_sample_corpus,
        "d_reservoir_sample": corpus.d_reservoir_sample,
        "t_heavy_hitters": corpus.t_heavy_hitters,
        "q_correlation": stats.q_correlation,
        "q_profile_tables": stats.q_profile_tables,
        "p_shard_plan": corpus.p_shard_plan,
        "t_bpe_pairs": corpus.t_bpe_pairs,
        "q_active_users": timeseries.q_active_users,
        "q_first_touch": events_ext.q_first_touch,
        "q_events_variant": events_ext.q_events_variant,
        "q_user_streaks": timeseries.q_user_streaks,
        "q_rolling_corr": stats.q_rolling_corr,
        "d_span_overlap": corpus.d_span_overlap,
        "q_mad": stats.q_mad,
        "d_knn_classify": corpus.d_knn_classify,
        "q_fk_integrity": stats.q_fk_integrity,
        "q_skyline": tpch_ext.q_skyline,
        "q_time_weighted_avg": timeseries.q_time_weighted_avg,
        "q_decay_score": timeseries.q_decay_score,
        "q_market_basket": mining.q_market_basket,
        "q_outlier_iqr": mining.q_outlier_iqr,
        "q_ab_test": mining.q_ab_test,
        "t_bm25": mining.t_bm25,
        "t_keyword_extract": mining.t_keyword_extract,
        "d_containment": docs.d_containment,
        "t_novelty": docs.t_novelty,
        "q_funnel_windows": mining.q_funnel_windows,
    }
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for each oracle-checkable query."""
    return {
        **tpch.ORACLE,
        **tpch_ext.ORACLE,
        **events.ORACLE,
        **events_ext.ORACLE,
        **etl_ext.ORACLE,
        **docs.ORACLE,
        **docs_ext.ORACLE,
        **io_rt.ORACLE,
        **timeseries.ORACLE,
        **corpus.ORACLE,
        **stats.ORACLE,
        **mining.ORACLE,
        **trends.ORACLE,
        **assoc.ORACLE,
        **quality.ORACLE,
    }
