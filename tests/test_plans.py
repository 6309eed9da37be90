"""Plan-shape assertions — the scale-discipline gate.

These tests fail if a refactor silently drops predicate pushdown,
column pruning, a broadcast, or introduces a cartesian product.
"""

import __spark_entry__ as entrymod
from pyspark.sql import functions as F
from locopy_spark.plans import audit


def _q(spark, sf_dir, name):
    return entrymod.queries()[name](spark, sf_dir)


def test_q6_filters_reach_scan(spark, sf_dir):
    df = _q(spark, sf_dir, "q6_forecast_revenue")
    pushed = " ".join(audit.pushed_filters(df))
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q6_column_pruning(spark, sf_dir):
    schemas = audit.read_schemas(_q(spark, sf_dir, "q6_forecast_revenue"))
    assert len(schemas) == 1
    # 4 columns read, not 11
    assert schemas[0].count(":") == 4
    assert "l_orderkey" not in schemas[0]


def test_q1_pushdown_and_pruning(spark, sf_dir):
    df = _q(spark, sf_dir, "q1_pricing_summary")
    assert any("l_shipdate" in f for f in audit.pushed_filters(df))
    assert all("l_orderkey" not in s for s in audit.read_schemas(df))


def test_q5_broadcasts_dimensions(spark, sf_dir):
    df = _q(spark, sf_dir, "q5_region_volume")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_dedup_no_cartesian(spark, sf_dir):
    for name in ("d_minhash_lsh", "d_simhash", "d_ngram_jaccard", "d_incr_dedup"):
        df = _q(spark, sf_dir, name)
        assert not audit.has_cartesian(df), name
        assert not audit.has_broadcast_nested_loop(df), name


def test_knn_is_broadcast_not_shuffle_cartesian(spark, sf_dir):
    # broadcast nested loop over the small query side is the intended
    # plan; a CartesianProduct (shuffle both sides) is not
    df = _q(spark, sf_dir, "s_knn_bruteforce")
    assert audit.has_broadcast_nested_loop(df)
    assert not audit.has_cartesian(df)


def test_asof_single_shuffle_per_side(spark, sf_dir):
    df = _q(spark, sf_dir, "q_orders_asof_events")
    # union + one window partitioning; no join-induced extra exchanges
    assert audit.shuffle_count(df) <= 3  # groupBy(user) + final agg + presentation sort
    assert not audit.has_cartesian(df)


def test_codegen_present(spark, sf_dir):
    assert audit.codegen_stage_count(_q(spark, sf_dir, "q1_pricing_summary")) >= 1


def test_q4_pushdown_semi_join(spark, sf_dir):
    df = _q(spark, sf_dir, "q4_order_priority")
    pushed = " ".join(audit.pushed_filters(df))
    assert "o_orderdate" in pushed
    assert not audit.has_cartesian(df)


def test_q9_broadcasts_dims(spark, sf_dir):
    df = _q(spark, sf_dir, "q9_product_profit")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_pii_scrub_prunes_columns(spark, sf_dir):
    df = _q(spark, sf_dir, "t_pii_scrub")
    schemas = audit.read_schemas(df)
    # only doc_id + text read from the documents scan
    assert schemas and all("lang" not in s and "source" not in s for s in schemas)


def test_quality_filter_prunes_columns(spark, sf_dir):
    df = _q(spark, sf_dir, "t_quality_filter")
    assert all("source" not in s for s in audit.read_schemas(df))


def test_ivf_no_shuffle_cartesian(spark, sf_dir):
    df = _q(spark, sf_dir, "s_knn_ivf")
    # centroid assignment is a broadcast nested loop (intended);
    # a shuffle CartesianProduct is not
    assert not audit.has_cartesian(df)


def test_retention_no_extra_shuffles(spark, sf_dir):
    df = _q(spark, sf_dir, "q_retention_cohorts")
    # distinct + cohort agg + join + final agg — bounded exchanges
    assert audit.shuffle_count(df) <= 3  # groupBy(user) + final agg + presentation sort
    assert not audit.has_cartesian(df)


def test_range_join_is_equijoin_not_nested_loop(spark, sf_dir):
    # the bucketed rewrite must produce a hash/merge equi-join;
    # a BroadcastNestedLoopJoin would mean the rewrite regressed to
    # the naive interval plan
    df = _q(spark, sf_dir, "q_range_join")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_merge_upsert_broadcasts_delta(spark, sf_dir):
    df = _q(spark, sf_dir, "q_merge_upsert")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    from locopy_spark.sources.bucketed import bucketed_join, write_bucketed
    from locopy_spark.sources.tables import load_table

    # managed tables land in the session's warehouse dir (static conf);
    # DROP TABLE in the finally block removes the files
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    write_bucketed(o, "b_orders", "o_custkey", n_buckets=4, sort_cols=["o_custkey"])
    write_bucketed(c, "b_customer", "o_custkey", n_buckets=4, sort_cols=["o_custkey"])
    # disable broadcast so the co-located sort-merge path is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "b_orders", "b_customer", on="o_custkey")
        assert audit.shuffle_count(j) == 0, audit.simple_plan(j)
        # result sanity: same count as the plain join
        plain = o.join(c, "o_custkey").count()
        assert j.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Hive-partitioned fact + selective broadcast dim → Spark must
    inject a dynamicpruning subquery on the partition column (only the
    matching partitions are scanned — the 100 TB time-travel pattern)."""
    from locopy_spark.sources.tables import load_table

    path = str(tmp_path / "orders_by_year")
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.partitionBy("o_year").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(1996, "keep"), (1997, "drop")], "d_year int, tag string"
    ).filter(F.col("tag") == "keep")
    j = fact.join(dim, fact.o_year == dim.d_year).groupBy("d_year").count()
    plan = audit.formatted_plan(j)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_repetition_bounded_shuffles(spark, sf_dir):
    # shingle explode → (doc,gram) agg → doc agg → left join back:
    # partial-aggregated shuffles only, no window, no cartesian
    df = _q(spark, sf_dir, "t_repetition")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 4


def test_knn_int8_no_shuffle_cartesian(spark, sf_dir):
    # both the quantized shortlist and the exact rerank broadcast the
    # query side; the only NL join is the broadcast scoring pass
    df = _q(spark, sf_dir, "s_knn_int8")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df) or audit.has_broadcast_nested_loop(df)


def test_mix_weights_single_agg_shuffle(spark, sf_dir):
    # token count is row-local; one shuffle to the source keys plus the
    # scalar-totals broadcast
    df = _q(spark, sf_dir, "p_mix_weights")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 3


def test_window_funcs_no_small_key_window(spark, sf_dir):
    # the rank must come from range-partitioned (__pid, group) windows —
    # full parallelism — never Window.partitionBy(o_orderpriority)
    # alone (5 keys → 5 tasks sorting 20% of orders each)
    df = _q(spark, sf_dir, "q_window_funcs")
    plan = audit.simple_plan(df)
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert specs, "expected window specs in the plan"
    for spec in specs:
        assert "__pid" in spec, f"window not keyed by partition id: {spec}"
    assert not audit.has_cartesian(df)


def test_semantic_dedup_bucketed_not_allpairs(spark, sf_dir):
    """The production near-dup join must be a bucket equi-join: no
    cartesian, and the candidate side must NOT be a broadcast nested
    loop over the full corpus (that would be the all-pairs baseline)."""
    from locopy_spark.operators.similarity import semantic_dedup_pairs
    from locopy_spark.sources.tables import load_table

    df = semantic_dedup_pairs(load_table(spark, sf_dir, "embeddings"))
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_asof_nearest_single_partitioning(spark, sf_dir):
    """nearest = both direction carries over ONE key partitioning: the
    dual window must not double the exchanges of the backward join."""
    df = _q(spark, sf_dir, "q_asof_nearest")
    assert audit.shuffle_count(df) <= 3  # union window + presentation sort
    assert not audit.has_cartesian(df)


def test_bigram_pmi_no_cartesian_and_pruned(spark, sf_dir):
    df = _q(spark, sf_dir, "t_bigram_pmi")
    assert not audit.has_cartesian(df)
    # only doc_id + text should be read from the documents scan
    assert all("source" not in s for s in audit.read_schemas(df))


def test_resample_ohlc_single_agg_no_window(spark, sf_dir):
    """OHLC must come from one partial-aggregated groupBy (min_by /
    max_by), never a per-bucket sort window; props/user_id pruned."""
    df = _q(spark, sf_dir, "q_resample_ohlc")
    assert audit.shuffle_count(df) <= 2  # agg + presentation sort
    assert "windowspecdefinition" not in audit.simple_plan(df)
    assert all("props" not in s and "user_id" not in s
               for s in audit.read_schemas(df))


def test_gap_fill_window_on_hourly_not_raw(spark, sf_dir):
    """The forward-fill window runs over the hourly table (spine-sized),
    and the raw-events scans stay pruned to the three used columns."""
    df = _q(spark, sf_dir, "q_gap_fill")
    assert audit.shuffle_count(df) <= 4
    assert not audit.has_cartesian(df)
    assert all("props" not in s and "user_id" not in s
               for s in audit.read_schemas(df))


def test_hypertable_rollup_one_scan(spark, sf_dir):
    """Three granularities from ONE events scan (grouping-sets expand),
    one aggregate shuffle plus the presentation sort."""
    df = _q(spark, sf_dir, "q_hypertable_rollup")
    assert len(audit.read_schemas(df)) == 1
    assert audit.shuffle_count(df) <= 2
    assert "Expand" in audit.simple_plan(df) or "expand" in audit.simple_plan(df).lower()


def test_reservoir_sample_take_ordered_no_shuffle(spark, sf_dir):
    """Exact-K selection must plan as TakeOrderedAndProject (per-
    partition top-K + single merge), never a global sort + limit."""
    df = _q(spark, sf_dir, "d_reservoir_sample")
    assert audit.shuffle_count(df) == 0
    assert "TakeOrdered" in audit.simple_plan(df)


def test_sample_corpus_gate_is_row_local(spark, sf_dir):
    """Only source-key-sized aggregates shuffle; the keep gate joins
    broadcast rates, so corpus rows never move."""
    df = _q(spark, sf_dir, "p_sample_corpus")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 7  # all over ~20 source keys


def test_heavy_hitters_bounded_shuffle(spark, sf_dir):
    """The MG candidate pass + recount must shuffle candidate-sized
    state only: candidate distinct, recount agg, presentation sort."""
    df = _q(spark, sf_dir, "t_heavy_hitters")
    assert audit.shuffle_count(df) <= 3
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_correlation_single_power_sum_shuffle(spark, sf_dir):
    """Second-order stats must flow through ONE partial-aggregated
    shuffle of decimal power sums — no window, no second scan."""
    df = _q(spark, sf_dir, "q_correlation")
    assert audit.shuffle_count(df) <= 2  # agg + presentation sort
    assert len(audit.read_schemas(df)) == 1
    assert "windowspecdefinition" not in audit.simple_plan(df)


def test_profile_two_scans_one_shuffle(spark, sf_dir):
    """The whole-table profile is two pruned scans (null/min/max pass
    + the Expand multi-distinct alone — mixing them degrades the whole
    aggregate to a SortAggregate), one shuffle, a 1-row cross join,
    and a row-local reshape."""
    df = _q(spark, sf_dir, "q_profile_tables")
    assert len(audit.read_schemas(df)) == 2
    assert audit.shuffle_count(df) <= 1
    # the distinct pass must keep its hash/object-hash Expand plan;
    # only the string-min/max pass may sort-aggregate (n rows, no
    # Expand blowup)
    plan = audit.simple_plan(df)
    assert "Expand" in plan


def test_shard_plan_distributed_prefix_sum(spark, sf_dir):
    """The running sum must come from __pid-partitioned windows (the
    distributed prefix-sum operator), never a global one-partition
    window."""
    df = _q(spark, sf_dir, "p_shard_plan")
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs
    for spec in specs:
        assert "__pid" in spec, f"global window: {spec}"
    assert not audit.has_cartesian(df)


def test_bpe_pairs_expands_vocab_not_corpus(spark, sf_dir):
    """Pair expansion happens after the (distinct word, count)
    aggregate: bounded shuffles, no cartesian, text-only scan."""
    df = _q(spark, sf_dir, "t_bpe_pairs")
    assert audit.shuffle_count(df) <= 3
    assert not audit.has_cartesian(df)
    assert all("source" not in s and "lang" not in s
               for s in audit.read_schemas(df))


def test_active_users_no_window_grid_sized(spark, sf_dir):
    """Sliding distinct must reduce to the (day,user) grid before the
    x7 contribution explode — no window function, no cartesian."""
    df = _q(spark, sf_dir, "q_active_users")
    plan = audit.simple_plan(df)
    assert "windowspecdefinition" not in plan
    assert not audit.has_cartesian(df)
    assert all("props" not in s and "value" not in s
               for s in audit.read_schemas(df))


def test_first_touch_bucketed_not_nested_loop(spark, sf_dir):
    """Attribution candidates must come from the bucketed equi range
    join + one min_by groupBy — no inequality nested loop, no
    per-purchase sort window."""
    df = _q(spark, sf_dir, "q_first_touch")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)
    assert "windowspecdefinition" not in audit.simple_plan(df)


def test_user_streaks_grid_sized_windows(spark, sf_dir):
    """Islands detection must run on the (user, day) grid with
    user-partitioned windows — never an unpartitioned window or a
    self-join."""
    df = _q(spark, sf_dir, "q_user_streaks")
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs
    for spec in specs:
        assert "user_id" in spec
    assert not audit.has_cartesian(df)


def test_rolling_corr_daily_series_window(spark, sf_dir):
    """The rolling moments window runs over the daily table (one row
    per calendar day), after a partial-aggregated daily groupBy; raw
    lineitem is scanned once."""
    df = _q(spark, sf_dir, "q_rolling_corr")
    assert len(audit.read_schemas(df)) == 1
    assert audit.shuffle_count(df) <= 3  # daily agg + window sort + presentation
    assert not audit.has_cartesian(df)


def test_span_overlap_bucket_join_not_allpairs(spark, sf_dir):
    """Span candidates come from the fingerprint-bucket equi-join —
    no cartesian, no nested loop, text-only scans."""
    df = _q(spark, sf_dir, "d_span_overlap")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)
    assert all("source" not in s and "lang" not in s
               for s in audit.read_schemas(df))


def test_mad_grouped_windows_only(spark, sf_dir):
    """Both rank-select phases must window on the group key (bounded
    per-key sorts), with the |groups|-sized median table broadcast."""
    df = _q(spark, sf_dir, "q_mad")
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs
    for spec in specs:
        assert "o_orderpriority" in spec
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_knn_classify_broadcast_votes(spark, sf_dir):
    """Scoring must broadcast the 10-query side (one NL pass over the
    corpus), with vote aggregation over q*k rows only."""
    df = _q(spark, sf_dir, "d_knn_classify")
    assert audit.has_broadcast_nested_loop(df) or audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_skyline_no_self_join(spark, sf_dir):
    """The Pareto frontier must come from the sort-scan formulation:
    one groupBy + a per-priority window over distinct prices + a
    semi-join back — never a quadratic dominance self-join (which
    would show as a cartesian / nested loop)."""
    df = _q(spark, sf_dir, "q_skyline")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs and all("o_orderpriority" in s for s in specs)


def test_twap_single_series_window(spark, sf_dir):
    """TWAP = one lead window on the series key + one aggregate; no
    cartesian, value/props pruned to the used columns."""
    df = _q(spark, sf_dir, "q_time_weighted_avg")
    assert audit.shuffle_count(df) <= 3
    assert not audit.has_cartesian(df)
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs and all("event_type" in s for s in specs)


def test_market_basket_no_self_join(spark, sf_dir):
    """Pair expansion is an array transform over per-order baskets —
    one groupBy(orderkey) shuffle feeds it, never a fact-fact
    self-join (and the only nested loop is the 1-row totals
    broadcast)."""
    df = _q(spark, sf_dir, "q_market_basket")
    assert not audit.has_cartesian(df)
    # the basket table is cached: every consumer reads the
    # InMemoryRelation, so lineitem is scanned once at runtime (the
    # plan text re-prints the defining FileScan per consumer — those
    # are cache re-expansions, not executed scans)
    assert "InMemory" in audit.simple_plan(df)


def test_novelty_bounded_shuffles(spark, sf_dir):
    """first-occurrence table joins back on the shingle key:
    shuffles stay O(1) count (shingle groupBy-min, shingle join,
    doc groupBy, presentation sort)."""
    df = _q(spark, sf_dir, "t_novelty")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)
    assert audit.shuffle_count(df) <= 6


def test_funnel_windows_co_shuffled(spark, sf_dir):
    """Each funnel stage joins the previous user-grain table back to
    events on user_id — no cartesian, no nested loop beyond the
    1-row stage-count broadcasts."""
    df = _q(spark, sf_dir, "q_funnel_windows")
    assert not audit.has_cartesian(df)


def test_outlier_iqr_broadcasts_quartiles(spark, sf_dir):
    df = _q(spark, sf_dir, "q_outlier_iqr")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_r5_queries_no_cartesian(spark, sf_dir):
    """None of the round-5 additions may plan a CartesianProduct —
    every pairing goes through an equi-join key (block, band, bucket,
    centroid, position) or a deliberate small-side broadcast."""
    for name in (
        "s_mips",
        "p_length_histogram",
        "p_curriculum_stages",
        "d_cluster_stats",
        "p_tokenizer_fertility",
        "q_fuzzy_match",
        "t_freq_drift",
        "d_embedding_moments",
        "q_attribution_linear",
        "q_bloom_semijoin",
        "d_dedup_keep_best",
        "t_langid_confusion",
        "q_rfm_segmentation",
        "d_source_syndication",
        "d_pps_sample",
        "q_cohort_ltv",
    ):
        df = _q(spark, sf_dir, name)
        assert not audit.has_cartesian(df), name


def test_mips_is_broadcast_scan(spark, sf_dir):
    # like s_knn_bruteforce: small query side broadcast against a
    # streaming scan — BNL intended, shuffle count minimal
    df = _q(spark, sf_dir, "s_mips")
    assert audit.has_broadcast_nested_loop(df)
    assert audit.shuffle_count(df) <= 2


def test_fuzzy_match_vocab_collapse_first(spark, sf_dir):
    # the fact table must collapse to distinct names BEFORE pairing:
    # the block join itself is an equi-join, and the whole plan stays
    # within the vocab aggregation + join + sort shuffle budget
    df = _q(spark, sf_dir, "q_fuzzy_match")
    assert audit.shuffle_count(df) <= 3
    assert not audit.has_broadcast_nested_loop(df)


def test_length_histogram_single_corpus_shuffle(spark, sf_dir):
    # one partial-aggregated groupBy over the corpus; the cumulative
    # windows run over the bounded bin aggregate
    df = _q(spark, sf_dir, "p_length_histogram")
    assert audit.shuffle_count(df) <= 1


def test_fertility_single_aggregate(spark, sf_dir):
    df = _q(spark, sf_dir, "p_tokenizer_fertility")
    assert audit.shuffle_count(df) <= 2  # aggregate + presentation sort


def test_freq_drift_vocab_bounded_shuffles(spark, sf_dir):
    df = _q(spark, sf_dir, "t_freq_drift")
    assert audit.shuffle_count(df) <= 7


def test_bloom_semijoin_broadcast_probe(spark, sf_dir):
    # the set-bit table must broadcast (it is bounded by the bit-array
    # size); the 1-row summary joins are broadcast too
    df = _q(spark, sf_dir, "q_bloom_semijoin")
    assert audit.has_broadcast_join(df)
    assert audit.shuffle_count(df) <= 7


def test_embedding_moments_partials_only(spark, sf_dir):
    # one mapInPandas partial per partition + dim²-sized groupBy; the
    # first-moment and count sides broadcast into the final join
    df = _q(spark, sf_dir, "d_embedding_moments")
    assert audit.has_broadcast_join(df)
    assert audit.shuffle_count(df) <= 5


def test_attribution_linear_equi_range_join(spark, sf_dir):
    # the touch candidates come from the bucketed range join — an
    # equi-join on (user, bucket), never an inequality nested loop
    df = _q(spark, sf_dir, "q_attribution_linear")
    assert not audit.has_broadcast_nested_loop(df)
    assert audit.shuffle_count(df) <= 7


def test_ols_trend_two_aggregates_only(spark, sf_dir):
    # daily aggregation + power-sum aggregation + presentation sort —
    # no join anywhere, nothing beyond group-cardinality shuffles
    df = _q(spark, sf_dir, "q_ols_trend")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 3


def test_theil_sen_equi_join_on_group(spark, sf_dir):
    # the pair expansion must be an equi-join on the group key with
    # the m-inequality as a post-filter — never a nested loop over
    # the monthly tables
    df = _q(spark, sf_dir, "q_theil_sen")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_benford_digit_rowlocal(spark, sf_dir):
    # one orders⨝customer join, then the digit CASE chain is a
    # row-local projection: aggregate shuffles are 9×|segments|-sized
    df = _q(spark, sf_dir, "q_benford")
    assert not audit.has_cartesian(df)
    assert audit.codegen_stage_count(df) >= 1


def test_graph_reach_no_cartesian(spark, sf_dir):
    df = _q(spark, sf_dir, "q_graph_reach")
    assert not audit.has_cartesian(df)


def test_dataset_card_single_scan_families(spark, sf_dir):
    # doc metrics are row-local; the median window + two aggregates
    # and the |sources|-sized join bound the shuffles
    df = _q(spark, sf_dir, "p_dataset_card")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 6


def test_cms_shuffles_are_sketch_sized(spark, sf_dir):
    # one vocab aggregate (map-side combined) + the d×w cell aggregate
    # + bounded probe joins — the probe side broadcasts
    df = _q(spark, sf_dir, "t_cms_counts")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_winsorized_fences_broadcast(spark, sf_dir):
    # the |groups|-sized fence table must broadcast back onto the rows
    df = _q(spark, sf_dir, "q_winsorized")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 4


def test_pq_knn_broadcast_codebook_no_cartesian(spark, sf_dir):
    # the one-row codebook and the query ADC tables broadcast; encoding
    # is a row-local map pass; the only NL joins are broadcast-small
    df = _q(spark, sf_dir, "s_pq_knn")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df) or audit.has_broadcast_nested_loop(df)


def test_prefix_join_bounded_shuffles_no_cartesian(spark, sf_dir):
    # df table + per-doc rank + candidate equi-join on the prefix
    # shingle + pair verification joins — all keyed shuffles, no
    # all-pairs product anywhere
    df = _q(spark, sf_dir, "d_prefix_join")
    assert not audit.has_cartesian(df)


def test_decile_lift_rank_then_tiny_aggregate(spark, sf_dir):
    # one range-partitioned exact rank over the orders + a 10-row
    # aggregate/window tail — no single-partition rank of the raw data
    df = _q(spark, sf_dir, "q_decile_lift")
    assert not audit.has_cartesian(df)


def test_weighted_quantiles_and_gini_no_skew_window(spark, sf_dir):
    # both rank via the range-partitioned grouped operators — no
    # one-task-per-group sort of the fact table, no cartesian
    for key in ("q_weighted_quantiles", "q_gini"):
        df = _q(spark, sf_dir, key)
        assert not audit.has_cartesian(df)


def test_rank_battery_single_prefix_sum_no_cartesian(spark, sf_dir):
    # the doubled-tie-rank family: one range-partitioned prefix sum
    # over a per-value aggregate — never a one-partition window over
    # raw rows, never a cartesian
    for key in ("q_ks_test", "q_mann_whitney", "q_wilcoxon"):
        df = _q(spark, sf_dir, key)
        assert not audit.has_cartesian(df), key
        assert audit.has_broadcast_join(df), key  # totals broadcast back


def test_spearman_broadcasts_small_rank_table(spark, sf_dir):
    # the y-side (line-count) rank table is |distinct counts|-sized
    # and must broadcast; the x-side joins on the value key
    df = _q(spark, sf_dir, "q_spearman")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_acf_xcorr_lag_equi_join_not_nested_loop(spark, sf_dir):
    # the lag table joins by equi-key (day/hour + lag), so the plan
    # must not degrade to a broadcast nested loop over the series
    for key in ("q_autocorr", "q_xcorr"):
        df = _q(spark, sf_dir, key)
        assert not audit.has_cartesian(df), key
        assert audit.has_broadcast_join(df), key


def test_runs_test_bounded_sorts_only(spark, sf_dir):
    # two range-partitioned global row numbers + a rank-adjacency
    # join over the |days|-sized table; no cartesian anywhere
    df = _q(spark, sf_dir, "q_runs_test")
    assert not audit.has_cartesian(df)


def test_assortativity_shares_edge_scaffolding(spark, sf_dir):
    # degree joins land on the |E| edge list; nothing all-pairs
    df = _q(spark, sf_dir, "q_assortativity")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_pareto_abc_single_prefix_sum(spark, sf_dir):
    # per-part aggregate -> ONE range-partitioned prefix sum -> 3-row
    # class aggregate; the total broadcasts back
    df = _q(spark, sf_dir, "q_pareto_abc")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_top_paths_two_aggregations_only(spark, sf_dir):
    # groupBy (user, day) then groupBy path + top-k: two hash
    # aggregate shuffles plus the presentation sort, nothing else
    df = _q(spark, sf_dir, "q_top_paths")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 3


def test_kendall_tau_grid_device_no_cartesian(spark, sf_dir):
    # the |Vx|x|Vy| grid comes from a broadcast cross of the <=7-row
    # y-dim (legitimate tiny broadcast), the running sum is
    # range-partitioned, the per-x window is parallel; the raw pair
    # space must never appear as a shuffle cartesian
    df = _q(spark, sf_dir, "q_kendall_tau")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_mann_kendall_bounded_broadcast_pairs(spark, sf_dir):
    # the sign-pair join runs over the broadcast |days|-sized daily
    # aggregate (bounded by the calendar) - a broadcast nested loop
    # is the DESIGNED shape here, a shuffle cartesian is not
    df = _q(spark, sf_dir, "q_mann_kendall")
    assert not audit.has_cartesian(df)


def test_cramers_v_broadcast_dim_and_margins(spark, sf_dir):
    # customer dim broadcasts into the fact scan; everything after the
    # |R|x|C| cell aggregate is a <=25-row plan
    df = _q(spark, sf_dir, "q_cramers_v")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_hhi_broadcast_dims_single_state_shuffle(spark, sf_dir):
    # supplier/nation broadcast; one partial-aggregated shuffle to the
    # |suppliers|-sized state, then |nations|-row arithmetic
    df = _q(spark, sf_dir, "q_hhi")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)
    assert audit.shuffle_count(df) <= 3


def test_kaplan_meier_bounded_sequential_tail(spark, sf_dir):
    # per-customer span aggregate + bounded-window prefix sum (r12:
    # the |calendar days| at-risk grid runs one plain window, no range
    # sampler); the sequential survival product is one Arrow task over
    # the bounded per-lifetime table, never a cartesian; the 1-row
    # horizon still rides as a broadcast
    df = _q(spark, sf_dir, "q_kaplan_meier")
    assert not audit.has_cartesian(df)
    assert audit.has_window(df)
    assert audit.has_broadcast_nested_loop(df)


def test_kruskal_wallis_single_prefix_sum(spark, sf_dir):
    # the q_mann_whitney doubled-rank device generalized: one
    # range-partitioned prefix sum over the per-value aggregate, the
    # rank table joins back on the value key
    df = _q(spark, sf_dir, "q_kruskal_wallis")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_new_vs_returning_copartitioned_join(spark, sf_dir):
    # first-month aggregate joins back on the customer key (one
    # shuffle each side); the monthly rollup is |months|-sized
    df = _q(spark, sf_dir, "q_new_vs_returning")
    assert not audit.has_cartesian(df)


def test_seasonal_decompose_bounded_window(spark, sf_dir):
    # the RANGE window runs over the |days|-sized daily aggregate
    # (bounded by the calendar), never raw orders
    df = _q(spark, sf_dir, "q_seasonal_decompose")
    assert not audit.has_cartesian(df)


def test_degree_dist_shares_edge_scaffolding(spark, sf_dir):
    # |E| union -> persisted |V| degree aggregate -> |degrees|
    # histogram; the 1-row total joins as a broadcast (nested-loop on
    # a 1-row side is the designed shape); the edge pipeline must be
    # built ONCE (persist reuse), so at most one lineitem scan pair
    df = _q(spark, sf_dir, "q_degree_dist")
    assert not audit.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both consumers (histogram + 1-row total) must read the persisted
    # degree table, not rebuild the edge pipeline
    assert plan.count("InMemoryTableScan") >= 2


def test_code_detect_row_local_single_rollup(spark, sf_dir):
    # row-local marker scoring + one partial-aggregated |sources|
    # rollup; only text and source are read
    df = _q(spark, sf_dir, "t_code_detect")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2
    schemas = audit.read_schemas(df)
    assert all("doc_id" not in s for s in schemas)


def test_boilerplate_row_local_dedup(spark, sf_dir):
    # within-doc span dedup is row-local (array_distinct before the
    # explode), so no exploded-level DISTINCT: shuffles are the
    # (source, span) df aggregate and the |sources| rollups
    df = _q(spark, sf_dir, "t_boilerplate")
    assert not audit.has_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "array_distinct" in plan


def test_pattern_negation_one_user_exchange(spark, sf_dir):
    # one hash exchange on user_id feeds both RANGE-frame windows;
    # the rollup is a 7-key aggregate
    df = _q(spark, sf_dir, "q_pattern_negation")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 3


def test_kcore_broadcast_threshold(spark, sf_dir):
    # the percentile threshold rides as a 1-row broadcast; survivor
    # joins are semi joins, never cartesian; the per-round counts are
    # 1-row aggregates (broadcast-nested-loop on 1-row sides is the
    # designed shape)
    df = _q(spark, sf_dir, "q_kcore")
    assert not audit.has_cartesian(df)


def test_rrf_fusion_broadcast_query_sides(spark, sf_dir):
    # query terms / vectors / idf table broadcast; the corpus token
    # table is exploded once (persisted) with row-local within-doc
    # dedup; the fusion join touches 2xPOOL rows per query
    df = _q(spark, sf_dir, "s_rrf_fusion")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_mmr_diversify_constant_rounds(spark, sf_dir):
    # the greedy rounds run inside ONE cogrouped Arrow task per query
    # over the |Q|xPOOL^2 sim table — never a cartesian, and the heavy
    # work (pool + sims) is computed once, distributed, up front
    df = _q(spark, sf_dir, "s_mmr_diversify")
    assert not audit.has_cartesian(df)


def test_sessions_concurrent_no_single_task_sort(spark, sf_dir):
    # sweep-line closed with the range-partitioned prefix sum: one
    # user-key exchange (sessionize), one range exchange (running
    # sum), one day rollup — no one-partition global window
    df = _q(spark, sf_dir, "q_sessions_concurrent")
    assert not audit.has_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    # the prefix-sum helper's partition-id plumbing must be present
    # (global_running_sum), proving no global unpartitioned window
    assert "__pid" in plan or "SPARK_PARTITION_ID" in plan.upper()


def test_prf_expand_shares_lexical_arm(spark, sf_dir):
    # one persisted postings explode feeds feedback selection AND
    # term collection; idf/doc-count sides broadcast
    df = _q(spark, sf_dir, "s_prf_expand")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_time_to_convert_shared_lookahead(spark, sf_dir):
    # one user-key exchange feeds the RANGE lookahead; order
    # statistics are range-partitioned (grouped_global_row_number) —
    # no per-weekday single-task sort
    df = _q(spark, sf_dir, "q_time_to_convert")
    assert not audit.has_cartesian(df)


def test_conversion_curve_single_pass(spark, sf_dir):
    # five conditional sums in ONE 1-row aggregate over the shared
    # lookahead — the curve costs one pass, not five
    df = _q(spark, sf_dir, "q_conversion_curve")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 3


def test_co_engagement_copartitioned_self_join(spark, sf_dir):
    # the (user, week, type) projection self-joins on its own
    # partitioning key; output is a <=|types|^2 matrix
    df = _q(spark, sf_dir, "q_co_engagement")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_dedup_yield_row_local_fingerprints(spark, sf_dir):
    # fingerprints are row-local; the only wide ops are the hash-key
    # join-back and the |sources| rollup
    df = _q(spark, sf_dir, "p_dedup_yield")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 4


def test_cochran_armitage_daily_reduction(spark, sf_dir):
    # one partial-aggregated shuffle to the |days| grain, then a
    # 1-row aggregate; no joins at all
    df = _q(spark, sf_dir, "q_cochran_armitage")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2
    schemas = audit.read_schemas(df)
    assert all("props" not in s and "user_id" not in s for s in schemas)


def test_discount_elasticity_broadcast_part(spark, sf_dir):
    # part carries the brand → broadcast to the fact scan, then ONE
    # |brands|-row aggregate shuffle (+ presentation sort)
    df = _q(spark, sf_dir, "q_discount_elasticity")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2
    schemas = audit.read_schemas(df)
    assert all("l_extendedprice" not in s for s in schemas)


def test_readability_row_local_histogram(spark, sf_dir):
    # the CLI score is row-local codegen; the only shuffles are the
    # |sources × 31| histogram aggregate and its presentation sort
    df = _q(spark, sf_dir, "t_readability")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2
    schemas = audit.read_schemas(df)
    assert all("doc_id" not in s and "lang" not in s for s in schemas)


def test_ttr_row_local_histogram(spark, sf_dir):
    # array_distinct/size run inside the scan projection — token
    # arrays never shuffle; only the bounded histogram aggregate does
    df = _q(spark, sf_dir, "t_ttr")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2
    schemas = audit.read_schemas(df)
    assert all("n_chars" not in s for s in schemas)


def test_filter_funnel_single_pass(spark, sf_dir):
    # all four gates fold into ONE partial-aggregated scan → a 1-row
    # exchange; the stack unpivot is a projection over 1 row
    df = _q(spark, sf_dir, "p_filter_funnel")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2
    schemas = audit.read_schemas(df)
    assert len(schemas) == 1  # documents scanned exactly once
    assert all("doc_id" not in s for s in schemas)


def test_dq_audit_one_join_no_cartesian(spark, sf_dir):
    # domain rules reduce inside their own table scans; the single
    # cross-table rule is an equi-join on the order key — never a
    # cartesian or nested loop
    df = _q(spark, sf_dir, "q_dq_audit")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_lpa_no_cartesian_bounded_rounds(spark, sf_dir):
    # pair expansion is the market-basket array kernel (no self-join
    # of the fact table); each LPA round is an equi-join + two
    # aggregates; labels localCheckpoint so lineage stays linear
    df = _q(spark, sf_dir, "q_lpa_communities")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_centroid_purity_broadcast_scoring(spark, sf_dir):
    # |labels| centroid-array rows broadcast against the vector scan
    # (the s_knn_bruteforce convention); never a shuffled cartesian
    df = _q(spark, sf_dir, "s_centroid_purity")
    assert audit.has_broadcast_nested_loop(df) or audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_session_gap_curve_single_window_pass(spark, sf_dir):
    # one per-user window shuffle + a 1-row aggregate: all five
    # thresholds from the same lag projection
    df = _q(spark, sf_dir, "q_session_gap_curve")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 3
    schemas = audit.read_schemas(df)
    assert all("props" not in s and "value" not in s for s in schemas)


def test_interleave_eval_range_partitioned_rank(spark, sf_dir):
    # the global position comes from the range-partitioned
    # global_row_number (partition-id plumbing visible), adjacent
    # rows meet in an equi-join on pos — never a one-partition window
    df = _q(spark, sf_dir, "p_interleave_eval")
    assert not audit.has_cartesian(df)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "__pid" in plan or "SPARK_PARTITION_ID" in plan.upper()


def test_mix_drift_bounded_grid(spark, sf_dir):
    # one input-sized aggregate to the |months × priorities| grid;
    # everything after joins bounded aggregates (broadcast margins)
    df = _q(spark, sf_dir, "q_mix_drift")
    assert not audit.has_cartesian(df)
    schemas = audit.read_schemas(df)
    assert all("o_totalprice" not in s and "o_custkey" not in s for s in schemas)


def test_partition_advisor_single_expand_per_table(spark, sf_dir):
    # all candidate groupings of a table ride ONE grouping-sets scan
    # (Expand), so the plan reads each table exactly once
    df = _q(spark, sf_dir, "q_partition_advisor")
    assert not audit.has_cartesian(df)
    schemas = audit.read_schemas(df)
    assert len(schemas) == 2  # orders once, events once
    plan = df._jdf.queryExecution().analyzed().toString()
    assert plan.count("Expand") == 2


def test_resume_plan_shared_prefix_sum_broadcast_checkpoints(spark, sf_dir):
    """The resume lookup reuses the distributed prefix sum
    (__pid-partitioned windows only — never a one-partition global
    window) and the 3-row checkpoint table rides a broadcast, so the
    cross join is a map-side constant expansion, not a cartesian
    shuffle."""
    df = _q(spark, sf_dir, "p_resume_plan")
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs
    for spec in specs:
        assert "__pid" in spec, f"global window: {spec}"
    assert not audit.has_cartesian(df)


def test_simpson_zipf_share_scan_shape(spark, sf_dir):
    """Both finishers read the documents table once each with text+
    source pruned (2 columns), no cartesian; zipf's rank is the
    range-partitioned device (__pid windows only) and its c1 join is
    a broadcast."""
    df = _q(spark, sf_dir, "t_simpson_diversity")
    assert not audit.has_cartesian(df)
    schemas = audit.read_schemas(df)
    assert schemas and all(s.count(":") == 2 for s in schemas)

    dz = _q(spark, sf_dir, "t_zipf_deviation")
    assert not audit.has_cartesian(dz)
    assert audit.has_broadcast_join(dz)
    plan = audit.simple_plan(dz)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs
    for spec in specs:
        assert "__pid" in spec, f"global window: {spec}"


def test_burstiness_user_partitioned_window(spark, sf_dir):
    """The lag window is partitioned on user_id (never global), the
    scan reads only the 3 needed columns, and no cartesian."""
    df = _q(spark, sf_dir, "q_burstiness")
    assert not audit.has_cartesian(df)
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs
    for spec in specs:
        assert "user_id" in spec, f"global window: {spec}"
    schemas = audit.read_schemas(df)
    assert schemas and all(s.count(":") == 3 for s in schemas)


def test_hapax_bounded_aggregate_shape(spark, sf_dir):
    """Third finisher on the shared state keeps the same shape:
    2-column pruned scan, no cartesian, no window at all (pure
    two-level aggregate)."""
    df = _q(spark, sf_dir, "t_hapax_ratio")
    assert not audit.has_cartesian(df)
    schemas = audit.read_schemas(df)
    assert schemas and all(s.count(":") == 2 for s in schemas)
    assert "windowspecdefinition" not in audit.simple_plan(df)


def test_norm_histogram_row_local_until_tiny_agg(spark, sf_dir):
    """Vectors never shuffle: single-column pruned scan, no window,
    no join, one ≤30-row aggregate."""
    df = _q(spark, sf_dir, "d_norm_histogram")
    assert not audit.has_cartesian(df)
    plan = audit.simple_plan(df)
    assert "windowspecdefinition" not in plan
    schemas = audit.read_schemas(df)
    assert schemas and all(s.count(":") == 1 for s in schemas)


def test_calendar_heatmap_bounded_broadcast_shape(spark, sf_dir):
    """One scan to the 168-cell state; the literal grid and 1-row
    total ride broadcasts (broadcast nested loop on constant sides is
    the legitimate case), no window, single pruned column."""
    df = _q(spark, sf_dir, "q_calendar_heatmap")
    assert not audit.has_cartesian(df)
    assert "windowspecdefinition" not in audit.simple_plan(df)
    schemas = [s for s in audit.read_schemas(df) if "ts" in s]
    assert schemas and all(s.count(":") == 1 for s in schemas)


def test_hubness_broadcast_sample_no_allpairs_shuffle(spark, sf_dir):
    """The sampled query side rides a broadcast (knn_bruteforce
    regime); the top-k window partitions on query_id; no cartesian
    (the nested loop's broadcast side is the bounded sample)."""
    df = _q(spark, sf_dir, "s_hubness")
    assert not audit.has_cartesian(df)
    plan = audit.simple_plan(df)
    specs = [seg.split(")")[0] for seg in plan.split("windowspecdefinition(")[1:]]
    assert specs
    for spec in specs:
        assert "query_id" in spec, f"global window: {spec}"


def test_dormancy_one_scan_broadcast_horizon(spark, sf_dir):
    """One partial-aggregated scan to the per-user max state, the
    1-row horizon broadcast (nested loop on a 1-row side is the
    legitimate case), no window, two pruned columns."""
    df = _q(spark, sf_dir, "q_dormancy_curve")
    assert not audit.has_cartesian(df)
    assert "windowspecdefinition" not in audit.simple_plan(df)
    schemas = audit.read_schemas(df)
    assert schemas and all(s.count(":") == 2 for s in schemas)


# -- round-7 additions --------------------------------------------------------


def test_nelson_aalen_plan(spark, sf_dir):
    df = _q(spark, sf_dir, "q_nelson_aalen")
    assert not audit.has_cartesian(df)
    # orders scan reads only the two columns the span aggregate needs
    assert all("o_totalprice" not in s for s in audit.read_schemas(df))


def test_lorenz_curve_plan(spark, sf_dir):
    df = _q(spark, sf_dir, "q_lorenz_curve")
    assert not audit.has_cartesian(df)
    # the ranked scaffolding reads only key/segment/price
    assert all("o_orderdate" not in s for s in audit.read_schemas(df))


def test_anova_single_pass(spark, sf_dir):
    df = _q(spark, sf_dir, "q_anova")
    assert not audit.has_cartesian(df)
    # one conditional-aggregate pass: partial agg + 1-row final exchange
    assert audit.shuffle_count(df) <= 1
    assert all("o_orderdate" not in s for s in audit.read_schemas(df))


def test_mrr_eval_broadcast_not_cartesian(spark, sf_dir):
    df = _q(spark, sf_dir, "s_mrr_eval")
    # query side broadcast against the streaming big side (the
    # knn_bruteforce regime); never a shuffle-both-sides cartesian
    assert audit.has_broadcast_nested_loop(df) or audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_markov_stationary_plan(spark, sf_dir):
    df = _q(spark, sf_dir, "q_markov_stationary")
    assert not audit.has_cartesian(df)


def test_centroid_assign_broadcast_no_window(spark, sf_dir):
    df = _q(spark, sf_dir, "s_centroid_assign")
    # |labels| centroid arrays broadcast; argmax via max_by aggregate,
    # never a per-vector window or cartesian
    assert audit.has_broadcast_join(df) or audit.has_broadcast_nested_loop(df)
    assert not audit.has_cartesian(df)
    assert "Window" not in audit.simple_plan(df)


def test_backlog_aging_pushdown(spark, sf_dir):
    df = _q(spark, sf_dir, "q_backlog_aging")
    # the status predicate reaches the parquet scan
    assert any("o_orderstatus" in f for f in audit.pushed_filters(df))
    assert not audit.has_cartesian(df)


def test_fulfillment_lag_single_equijoin(spark, sf_dir):
    df = _q(spark, sf_dir, "q_fulfillment_lag")
    assert not audit.has_cartesian(df)
    # lineitem scan pruned to (orderkey, shipdate)
    assert all("l_extendedprice" not in s for s in audit.read_schemas(df))


def test_vocab_growth_plan(spark, sf_dir):
    df = _q(spark, sf_dir, "t_vocab_growth")
    assert not audit.has_cartesian(df)
    # documents scan pruned to (doc_id, text)
    assert all("lang" not in s for s in audit.read_schemas(df))


def test_peak_days_bounded_window(spark, sf_dir):
    df = _q(spark, sf_dir, "q_peak_days")
    assert not audit.has_cartesian(df)
    # orders scan pruned to (date, price)
    assert all("o_orderpriority" not in s for s in audit.read_schemas(df))


def test_seasonal_strength_two_aggregates(spark, sf_dir):
    df = _q(spark, sf_dir, "q_seasonal_strength")
    assert not audit.has_cartesian(df)
    # daily aggregate + the 1-row pivot: two exchanges, nothing more
    assert audit.shuffle_count(df) <= 2


def test_silhouette_broadcast_no_window(spark, sf_dir):
    df = _q(spark, sf_dir, "s_silhouette")
    assert audit.has_broadcast_join(df) or audit.has_broadcast_nested_loop(df)
    assert not audit.has_cartesian(df)
    assert "Window" not in audit.simple_plan(df)


def test_value_migration_plan(spark, sf_dir):
    df = _q(spark, sf_dir, "q_value_migration")
    assert not audit.has_cartesian(df)
    # orders pruned to (custkey, date, price)
    assert all("o_orderpriority" not in s for s in audit.read_schemas(df))


def test_street_vs_list_broadcast(spark, sf_dir):
    df = _q(spark, sf_dir, "q_street_vs_list")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)
    # part scan pruned to key/brand/retail
    assert all("p_type" not in s for s in audit.read_schemas(df))


def test_basket_size_dist_single_join(spark, sf_dir):
    df = _q(spark, sf_dir, "q_basket_size_dist")
    assert not audit.has_cartesian(df)
    assert all("l_extendedprice" not in s for s in audit.read_schemas(df))


def test_revenue_bridge_broadcast(spark, sf_dir):
    df = _q(spark, sf_dir, "q_revenue_bridge")
    assert audit.has_broadcast_join(df)
    assert not audit.has_cartesian(df)


def test_drawdown_bounded_window(spark, sf_dir):
    df = _q(spark, sf_dir, "q_drawdown")
    assert not audit.has_cartesian(df)
    assert all("o_orderpriority" not in s for s in audit.read_schemas(df))


def test_overlap_matrices_no_cartesian(spark, sf_dir):
    for name in ("t_source_overlap", "q_type_overlap"):
        df = _q(spark, sf_dir, name)
        assert not audit.has_cartesian(df), name


def test_goodman_lambda_shares_cramers_state_shape(spark, sf_dir):
    # same contingency_state as q_cramers_v: customer dim broadcasts
    # into the fact scan; every post-cell aggregate and the four margin
    # scalars are <=25-row broadcasts (crossJoins are constant-sized,
    # not cartesian blowups)
    df = _q(spark, sf_dir, "q_goodman_lambda")
    assert audit.has_broadcast_join(df)
    assert audit.shuffle_count(df) <= 4


def test_price_index_co_keyed_self_join(spark, sf_dir):
    # one partial-aggregated lineitem scan to the |parts x years|
    # state; the adjacent-year self-join is an equi-join (never a
    # cartesian); the rollup is |years|-bounded
    df = _q(spark, sf_dir, "q_price_index")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 5


def test_stickiness_grid_reduction_no_window(spark, sf_dir):
    # everything reduces to the distinct (day,user) grid; the month
    # arms are bounded aggregates joined via broadcast; no window
    df = _q(spark, sf_dir, "q_stickiness")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)
    assert not audit.has_window(df)


def test_changepoint_bounded_ranking_no_cartesian(spark, sf_dir):
    # shared peaks_state daily aggregate; prefix sum + rank are the
    # range-partitioned primitives over the bounded daily table; the
    # 1-row total crossJoin is a constant broadcast, not a cartesian
    df = _q(spark, sf_dir, "q_changepoint")
    assert not audit.has_cartesian(df)


def test_levene_grouped_rank_then_single_state(spark, sf_dir):
    # (priority, value) grid partial-agg (value-domain bounded, never
    # a data-sized rank window), grid-sized cum sums pick the median,
    # |groups|-row broadcast back, one conditional-aggregate to a
    # 1-row state; no cartesian
    df = _q(spark, sf_dir, "q_levene")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_kappa_single_cube_over_bounded_cells(spark, sf_dir):
    # one broadcast-NL scoring pass to the <=|labels|^2 cells, one
    # cube, bounded margin join; no cartesian
    df = _q(spark, sf_dir, "s_kappa")
    assert not audit.has_cartesian(df)


def test_ndcg_eval_broadcast_eval_shape(spark, sf_dir):
    # the same two broadcast-query scans as s_mrr_eval over the shared
    # persisted coded table; per-item ranks are count aggregates
    df = _q(spark, sf_dir, "s_ndcg_eval")
    assert not audit.has_cartesian(df)


def test_abc_xyz_grid_sized_shuffles(spark, sf_dir):
    # one lineitem scan to the (part, month) grid carrying qty AND
    # revenue; per-part rollup; one range-partitioned prefix sum;
    # broadcast scalars — no cartesian
    df = _q(spark, sf_dir, "q_abc_xyz")
    assert not audit.has_cartesian(df)


def test_odds_ratio_single_pass_one_row(spark, sf_dir):
    # one conditional-aggregate scan to a 1-row state; row-local close
    df = _q(spark, sf_dir, "q_odds_ratio")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 1


def test_attribution_markov_bounded_iteration(spark, sf_dir):
    # two same-key window passes to the bounded matrix; base + all
    # removals iterate in one Arrow task; no cartesian anywhere
    df = _q(spark, sf_dir, "q_attribution_markov")
    assert not audit.has_cartesian(df)


def test_payload_dedup_payloads_never_shuffle(spark, sf_dir):
    # only (doc_id, digest, byte_len) rows move; the binary payload
    # column must be pruned out before the digest groupBy exchange
    df = _q(spark, sf_dir, "m_payload_dedup")
    assert not audit.has_cartesian(df)
    plan = audit.simple_plan(df)
    # one hash aggregate exchange on the digest; no payload column in
    # the exchange (it is derived and dropped projection-side)
    assert audit.shuffle_count(df) <= 2


def test_attribution_decay_bucketed_range_join(spark, sf_dir):
    # the same bucketed equi range join as q_attribution_linear; no
    # inequality nested loop, no cartesian
    df = _q(spark, sf_dir, "q_attribution_decay")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_xmr_control_bounded_window(spark, sf_dir):
    # shared peaks_state daily aggregate; the lag window runs over the
    # bounded daily table; scalars broadcast; no cartesian
    df = _q(spark, sf_dir, "q_xmr_control")
    assert not audit.has_cartesian(df)


def test_brand_xcorr_grid_sized_pair_join(spark, sf_dir):
    # one broadcast part join to the (brand, month) grid; the pair
    # self-join runs month-aligned over the bounded grid; no cartesian
    df = _q(spark, sf_dir, "q_brand_xcorr")
    assert not audit.has_cartesian(df)
    assert audit.has_broadcast_join(df)


def test_croston_per_part_arrow_groups(spark, sf_dir):
    # shared (part, month) grid; the sequential recurrences run as
    # per-part Arrow groups — no cartesian, no global sort
    df = _q(spark, sf_dir, "q_croston")
    assert not audit.has_cartesian(df)


def test_demand_obsolete_grid_rollup(spark, sf_dir):
    # shared demand grid -> per-part min/max/count + 1-row broadcast
    df = _q(spark, sf_dir, "q_demand_obsolete")
    assert not audit.has_cartesian(df)


def test_bollinger_bounded_daily_window(spark, sf_dir):
    # bounded daily table; one ordered rolling frame; no cartesian
    df = _q(spark, sf_dir, "q_bollinger")
    assert not audit.has_cartesian(df)


def test_rsi_bounded_daily_window(spark, sf_dir):
    # bounded daily table; lag + one ordered rolling frame; no cartesian
    df = _q(spark, sf_dir, "q_rsi")
    assert not audit.has_cartesian(df)


def test_newsvendor_grid_order_statistic(spark, sf_dir):
    # shared demand grid -> per-part bounded windows; no cartesian
    df = _q(spark, sf_dir, "q_newsvendor")
    assert not audit.has_cartesian(df)


def test_jaccard_links_capped_wedges(spark, sf_dir):
    # capped middle-vertex adjacency self-join; anti-join to edges;
    # degree joins candidate-sized; top-K TakeOrdered; no cartesian
    df = _q(spark, sf_dir, "q_jaccard_links")
    assert not audit.has_cartesian(df)


def test_little_law_month_spine_explode(spark, sf_dir):
    # per-order state -> <=|months-per-order| spine explode -> two
    # month-sized aggs; no cartesian
    df = _q(spark, sf_dir, "q_little_law")
    assert not audit.has_cartesian(df)


def test_supplier_leadtime_grid_quantiles(spark, sf_dir):
    # one |lineitem| join, one groupBy to the bounded (supplier, lag)
    # grid, bounded per-supplier windows; no cartesian
    df = _q(spark, sf_dir, "q_supplier_leadtime")
    assert not audit.has_cartesian(df)


def test_mase_bounded_window(spark, sf_dir):
    # one partial-aggregated daily state, one |days|-bounded window,
    # one global agg; no cartesian
    df = _q(spark, sf_dir, "q_mase")
    assert not audit.has_cartesian(df)


def test_logrank_prefix_sum_no_cartesian(spark, sf_dir):
    # span partial-agg + dimension join + two ranged prefix sums over
    # the bounded exit table; broadcast totals; no cartesian
    df = _q(spark, sf_dir, "q_logrank")
    assert not audit.has_cartesian(df)


def test_ship_sla_grid_no_cartesian(spark, sf_dir):
    # one |lineitem| join + one groupBy to the bounded month x priority
    # grid; row-local ppm closes; no cartesian
    df = _q(spark, sf_dir, "q_ship_sla")
    assert not audit.has_cartesian(df)


def test_friedman_bounded_ranks(spark, sf_dir):
    # grid partial-agg, per-month k-row rank windows, broadcast scalar;
    # no cartesian beyond the 1-row broadcast
    df = _q(spark, sf_dir, "q_friedman")
    assert not audit.has_cartesian(df)


def test_clustering_coef_no_cartesian(spark, sf_dir):
    # capped-center wedge self-join + ONE equi-join against the edge
    # list; left join re-enters zero-triangle centers; no cartesian
    df = _q(spark, sf_dir, "q_clustering_coef")
    assert not audit.has_cartesian(df)
    assert not audit.has_broadcast_nested_loop(df)


def test_mcnemar_single_state_pass(spark, sf_dir):
    # one year-filtered scan -> per-customer OR flags -> one count agg;
    # no joins at all
    df = _q(spark, sf_dir, "q_mcnemar")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2  # custkey agg + final 1-row agg


def test_price_dispersion_agg_before_dim_join(spark, sf_dir):
    # lineitem aggregates to |parts|-sized power sums BEFORE the part
    # dim joins; no cartesian
    df = _q(spark, sf_dir, "q_price_dispersion")
    assert not audit.has_cartesian(df)


def test_growth_accounting_user_keyed_windows(spark, sf_dir):
    # distinct grid -> user-keyed lag/lead windows -> grid-sized aggs
    # -> |weeks|-bounded full-outer; no cartesian
    df = _q(spark, sf_dir, "q_growth_accounting")
    assert not audit.has_cartesian(df)


def test_did_broadcast_dim_and_four_cells(spark, sf_dir):
    # fact-dim equi-join (2-col part projection), one partial-agg to
    # 4 cells, row-local pivot; no cartesian
    df = _q(spark, sf_dir, "q_did")
    assert not audit.has_cartesian(df)


def test_cliffs_delta_single_prefix_pass(spark, sf_dir):
    # per-value grid + one ranged prefix sum; identity closes the
    # third count; no pairwise join, no cartesian
    df = _q(spark, sf_dir, "q_cliffs_delta")
    assert not audit.has_cartesian(df)


def test_capture_recapture_one_state_pass(spark, sf_dir):
    # the shared mcnemar flag state + one count agg; no joins
    df = _q(spark, sf_dir, "q_capture_recapture")
    assert not audit.has_cartesian(df)
    assert audit.shuffle_count(df) <= 2


def test_pagerank_iterations_zero_exchange_above_cache(spark, sf_dir):
    """The round-10 pagerank shape: the persisted edge state is
    repartitioned by dst, the broadcast rank join preserves that
    partitioning, and the per-iteration groupBy(dst) aggregates with
    ZERO exchanges above the cache — all iteration shuffles collapsed
    into the one build shuffle.  Without the repartition the same
    subplan carries one exchange per iteration (asserted as the
    contrast so the test fails loudly if Spark's partitioning
    propagation ever changes)."""
    from pyspark.sql import functions as F

    from locopy_spark.plans import audit
    from locopy_spark.queries.mining import PR_SCALE, copurchase_edges

    e = copurchase_edges(spark, sf_dir)
    und = e.selectExpr("a AS src", "b AS dst").unionByName(
        e.selectExpr("b AS src", "a AS dst")
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(
        "src", F.lit(PR_SCALE).cast("long").alias("r")
    ).localCheckpoint()

    def iteration_exchanges(ed0):
        ed = ed0.persist()
        try:
            ed.count()
            contrib = ed.join(F.broadcast(ranks), "src").select(
                "dst", F.expr("r div d").alias("c")
            )
            nxt = contrib.groupBy(F.col("dst").alias("src")).agg(
                F.sum("c").alias("r")
            )
            above = audit.simple_plan(nxt).split("InMemoryTableScan")[0]
            return above.count("Exchange hashpartitioning")
        finally:
            ed.unpersist()

    assert iteration_exchanges(und.join(deg, "src").repartition("dst")) == 0
    assert iteration_exchanges(und.join(deg, "src")) == 1


def test_ann_indexed_serving_reads_bucketed_storage(spark, sf_dir):
    """The materialized ANN index serving path must actually read
    bucketed tables (the scan reports Bucketed: true) and stay
    narrow: the LSH path's only exchanges are the candidate distinct
    + rescore-side shuffle (the bucketed base side plans without its
    own exchange), and the IVF path is one exchange."""
    from locopy_spark.operators import ann_index
    from locopy_spark.plans import audit
    from locopy_spark.queries.docs import KNN_K, KNN_QUERY_IDS
    from locopy_spark.sources.tables import load_table

    ann_index.materialize_ann_index(
        load_table(spark, sf_dir, "embeddings"), prefix="plans_ann"
    )
    lsh = ann_index.knn_lsh_indexed(
        spark, KNN_QUERY_IDS, KNN_K, prefix="plans_ann"
    )
    assert audit.formatted_plan(lsh).count("Bucketed: true") >= 3
    assert audit.shuffle_count(lsh) <= 2
    ivf = ann_index.knn_ivf_indexed(
        spark, [0, 1, 2, 3, 4], 5, prefix="plans_ann"
    )
    assert audit.formatted_plan(ivf).count("Bucketed: true") >= 2
    assert audit.shuffle_count(ivf) <= 1
