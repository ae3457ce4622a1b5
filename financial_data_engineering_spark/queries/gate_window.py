"""Driver gate window ordering — GENERATED, do not edit.

Regenerate with ``python tools/gen_gate_window.py`` (CI asserts
freshness via --check against GATE_WINDOW_INPUTS below, so a
driver-written CORRECTNESS file newer than the last regeneration
does not flunk the committed ordering). Policy and provenance
live in the generator's docstring; the trailing comment on each
line is the query's latest driver-green round (never = no
driver row yet).
"""

#: CORRECTNESS files this ordering derives from (path -> sha256/16).
GATE_WINDOW_INPUTS = {
    "CORRECTNESS_r01.json": "1f593b66032e8e9f",
    "CORRECTNESS_r02.json": "1f593b66032e8e9f",
    "CORRECTNESS_r03.json": "6ebfdf79e2a23324",
    "CORRECTNESS_r04.json": "2dc9bba62afca641",
    "CORRECTNESS_r05.json": "8616d396e1a15c5b",
    "CORRECTNESS_r06.json": "b6990091b8fffb4e",
    "CORRECTNESS_r07.json": "7e81c5463a3be4ca",
}

GATE_WINDOW = [
    "part_brand_monthly_returns",  # never
    "part_brand_gap_counts",  # never
    "part_brand_beta",  # never
    "brand_return_correlation",  # never
    "part_brand_return_seasonality",  # never
    "part_brand_underwater_runs",  # never
    "user_value_underwater_runs",  # never
    "user_monthly_bar_diffs",  # never
    "ann_quantized_rerank",  # never
    "doc_bpe_encoding",  # never
    "quality_freshness_events",  # r5
    "quality_completeness_lineitem",  # r5
    "quality_uniqueness_orders",  # r5
    "quality_range_quantity",  # r5
    "quality_pattern_customer_name",  # r5
    "pricing_summary",  # r5
    "latest_order_per_customer",  # r5
    "top_customers_by_revenue",  # r5
    "nation_latest_order_revenue",  # r5
    "order_distinct_counts",  # r5
    "lineitem_global_stats",  # r5
    "high_value_parties",  # r5
    "revenue_by_region_segment",  # r5
    "order_priority_share",  # r5
    "priority_fulfillment_latency",  # r5
    "bpe_merge_candidates",  # r5
    "bpe_learned_merges",  # r5
    "event_value_dispersion",  # r6
    "lineitem_measure_unpivot",  # r6
    "ann_ivf_from_index",  # r6
    "dedup_semantic_clusters",  # r6
    "customer_order_stats_salted",  # r6
    "source_vocab_overlap",  # r6
    "small_quantity_order_revenue",  # r6
    "knn_brute_force_cosine",  # r6
    "ann_lsh_cosine",  # r6
    "ann_lsh_multiprobe",  # r6
    "embedding_quantization_stats",  # r6
    "ann_ivf_cosine",  # r6
    "kmv_distinct_customers",  # r6
    "kmv_priority_union",  # r6
    "doc_text_stats",  # r6
    "doc_lang_id",  # r6
    "source_quality_rollup",  # r6
    "doc_fingerprints",  # r6
    "doc_bpe_tokens",  # r6
    "doc_sample_stratified",  # r6
    "doc_pack_bins",  # r6
    "source_vocab_stats",  # r6
    "top_bigrams",  # r6
    "doc_repetition_flags",  # r6
    "doc_chunks",  # r6
    "tfidf_top_terms",  # r6
    "pii_scrub_stats",  # r6
    "doc_dense_ids",  # r6
    "eval_contamination",  # r6
    "dedup_simhash",  # r6
    "dedup_embedding_cosine",  # r6
    "dedup_winnowing",  # r6
    "dedup_exact_survivors",  # r6
    "dedup_minhash_lsh",  # r6
    "dedup_ngram_jaccard",  # r6
    "dedup_simhash_pairs",  # r6
    "dedup_component_groups",  # r6
    "user_sessions",  # r6
    "events_value_histogram",  # r6
    "user_retention_cohorts",  # r6
    "multimodal_decode_stats",  # r6
    "event_type_counts",  # r6
    "customers_without_orders",  # r6
    "top_part_nouns",  # r6
    "customer_padded_keys",  # r6
    "order_week_shipments",  # r6
    "lineitem_price_quantiles",  # r6
    "customer_overlapping_orders",  # r6
    "shipping_priority_revenue",  # r6
    "region_local_supplier_volume",  # r6
    "part_brand_vwap",  # r7
    "customer_order_gaps",  # r7
    "user_value_twap",  # r7
    "dedup_bloom_screen",  # r7
    "part_brand_ohlc_monthly",  # r7
    "user_value_ohlc",  # r7
    "part_brand_rolling_band",  # r7
    "part_brand_ewma_band",  # r7
    "order_priority_delayed_counts",  # r7
    "event_type_cm_audit",  # r7
    "part_brand_max_drawdown",  # r7
    "user_value_ewma_band",  # r7
    "user_value_max_drawdown",  # r7
    "cross_doc_repeated_spans",  # r7
    "doc_boilerplate_coverage",  # r7
    "user_value_rolling_band",  # r7
    "part_brand_return_stats",  # r7
    "event_transition_counts",  # r7
    "user_value_gapfill",  # r7
    "orders_priority_pivot",  # r7
    "customer_revenue_deciles",  # r7
    "nation_revenue_running_share",  # r7
    "top_parts_per_nation",  # r7
    "part_fuzzy_name_blocks",  # r7
    "nations_full_priority_coverage",  # r7
    "kmv_priority_intersect",  # r7
    "embedding_label_centroids",  # r7
    "user_rolling_value_7d",  # r7
    "lineitem_quantity_mad_outliers",  # r7
    "ann_rrf_fusion",  # r7
    "event_props_rollup",  # r7
    "doc_split_assign",  # r7
    "doc_mix_rebalance",  # r7
    "dedup_incremental_new_unique",  # r7
    "dedup_group_representatives",  # r7
    "dedup_incremental_minhash",  # r7
    "date_dimension",  # r7
    "surrogate_keys_nation",  # r7
    "fact_orders_star",  # r7
    "customer_priority_scd2",  # r7
    "lineitem_priority_asof",  # r7
    "hourly_event_rollup",  # r7
    "sliding_event_counts",  # r7
    "event_funnel_pairs",  # r7
    "events_asof_latest_order",  # r7
    "event_rollup_grouping_sets",  # r7
    "sliding_active_users",  # r7
    "user_browse_to_buy_runs",  # r7
    "multimodal_resize_stats",  # r7
    "multimodal_frame_stats",  # r7
]
