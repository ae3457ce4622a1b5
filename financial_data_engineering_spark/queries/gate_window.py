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
    "CORRECTNESS_r08.json": "40bd3ea0cbecf26f",
    "CORRECTNESS_r09.json": "820a2ddda5274b96",
    "CORRECTNESS_r10.json": "a2bb25f96e638674",
    "CORRECTNESS_r11.json": "f3afa12d3356b7f3",
    "CORRECTNESS_r12.json": "3e0c9b3d55df9c2f",
    "CORRECTNESS_r13.json": "a216a1b86f0eb4fe",
}

GATE_WINDOW = [
    "dedup_winnowing_decimated",  # never
    "dedup_simhash_topk",  # never
    "part_copurchase_triangles_xcheck",  # never
    "doc_bpe_encoding_decimated",  # never
    "ann_rrf_fusion",  # r10
    "event_props_rollup",  # r10
    "doc_split_assign",  # r10
    "doc_mix_rebalance",  # r10
    "dedup_incremental_new_unique",  # r10
    "dedup_group_representatives",  # r10
    "dedup_incremental_minhash",  # r10
    "date_dimension",  # r10
    "surrogate_keys_nation",  # r10
    "fact_orders_star",  # r10
    "customer_priority_scd2",  # r10
    "min_cost_part_suppliers",  # r11
    "discount_band_revenue",  # r11
    "late_shipment_priority_counts",  # r11
    "lineitem_priority_asof",  # r11
    "hourly_event_rollup",  # r11
    "sliding_event_counts",  # r11
    "event_funnel_pairs",  # r11
    "events_asof_latest_order",  # r11
    "event_rollup_grouping_sets",  # r11
    "sliding_active_users",  # r11
    "user_browse_to_buy_runs",  # r11
    "multimodal_resize_stats",  # r11
    "multimodal_frame_stats",  # r11
    "part_brand_monthly_returns",  # r11
    "part_brand_gap_counts",  # r11
    "part_brand_beta",  # r11
    "brand_return_correlation",  # r11
    "part_brand_return_seasonality",  # r11
    "part_brand_underwater_runs",  # r11
    "user_value_underwater_runs",  # r11
    "user_monthly_bar_diffs",  # r11
    "ann_quantized_rerank",  # r11
    "doc_bpe_encoding",  # r11
    "quality_freshness_events",  # r11
    "quality_completeness_lineitem",  # r11
    "quality_uniqueness_orders",  # r11
    "quality_range_quantity",  # r11
    "quality_pattern_customer_name",  # r11
    "pricing_summary",  # r11
    "latest_order_per_customer",  # r11
    "top_customers_by_revenue",  # r11
    "nation_latest_order_revenue",  # r11
    "order_distinct_counts",  # r11
    "lineitem_global_stats",  # r11
    "high_value_parties",  # r11
    "revenue_by_region_segment",  # r11
    "order_priority_share",  # r11
    "priority_fulfillment_latency",  # r11
    "bpe_merge_candidates",  # r11
    "event_value_dispersion",  # r11
    "lineitem_measure_unpivot",  # r11
    "ann_ivf_from_index",  # r11
    "dedup_semantic_clusters",  # r11
    "customer_order_stats_salted",  # r11
    "source_vocab_overlap",  # r11
    "small_quantity_order_revenue",  # r11
    "knn_brute_force_cosine",  # r11
    "ann_lsh_cosine",  # r11
    "ann_lsh_multiprobe",  # r11
    "embedding_quantization_stats",  # r11
    "part_copurchase_kcore_exact",  # r12
    "ann_ivf_cosine",  # r12
    "kmv_distinct_customers",  # r12
    "kmv_priority_union",  # r12
    "doc_text_stats",  # r12
    "doc_lang_id",  # r12
    "source_quality_rollup",  # r12
    "doc_fingerprints",  # r12
    "doc_bpe_tokens",  # r12
    "doc_sample_stratified",  # r12
    "doc_pack_bins",  # r12
    "source_vocab_stats",  # r12
    "top_bigrams",  # r12
    "ann_pq_rerank",  # r12
    "ann_ivfpq_rerank",  # r12
    "part_copurchase_pagerank",  # r12
    "customer_cdc_merge",  # r12
    "lineitem_zorder_skipping",  # r12
    "part_copurchase_triangles",  # r12
    "part_copurchase_cheapest_path",  # r12
    "doc_bm25_topk",  # r12
    "part_association_rules",  # r12
    "part_copurchase_communities",  # r12
    "doc_repetition_flags",  # r12
    "doc_chunks",  # r12
    "tfidf_top_terms",  # r12
    "pii_scrub_stats",  # r12
    "doc_dense_ids",  # r12
    "eval_contamination",  # r12
    "dedup_simhash",  # r12
    "dedup_embedding_cosine",  # r12
    "dedup_winnowing",  # r12
    "dedup_exact_survivors",  # r12
    "dedup_minhash_lsh",  # r12
    "dedup_ngram_jaccard",  # r12
    "dedup_simhash_pairs",  # r12
    "dedup_component_groups",  # r12
    "user_sessions",  # r12
    "events_value_histogram",  # r12
    "user_retention_cohorts",  # r12
    "multimodal_decode_stats",  # r12
    "event_type_counts",  # r12
    "customers_without_orders",  # r12
    "top_part_nouns",  # r12
    "customer_padded_keys",  # r12
    "order_week_shipments",  # r12
    "lineitem_price_quantiles",  # r12
    "customer_overlapping_orders",  # r12
    "shipping_priority_revenue",  # r12
    "region_local_supplier_volume",  # r12
    "multimodal_pixel_roundtrip",  # r13
    "part_brand_vwap",  # r13
    "customer_order_gaps",  # r13
    "user_value_twap",  # r13
    "dedup_bloom_screen",  # r13
    "part_brand_ohlc_monthly",  # r13
    "user_value_ohlc",  # r13
    "part_brand_rolling_band",  # r13
    "part_brand_ewma_band",  # r13
    "order_priority_delayed_counts",  # r13
    "event_type_cm_audit",  # r13
    "bpe_learned_merges",  # r13
    "customer_order_count_distribution",  # r13
    "suppliers_kept_order_waiting",  # r13
    "inactive_rich_customers_by_nation",  # r13
    "part_value_concentration",  # r13
    "top_quarter_supplier",  # r13
    "customer_scd2_history",  # r13
    "part_copurchase_kcore",  # r13
    "nation_pair_trade_volume",  # r13
    "nation_market_share",  # r13
    "profit_by_nation_year",  # r13
    "returned_item_top_customers",  # r13
    "promo_revenue_share",  # r13
    "supplier_cnt_by_part_attrs",  # r13
    "large_volume_customers",  # r13
    "part_disjunctive_revenue",  # r13
    "qualified_part_suppliers",  # r13
    "hll_distinct_orders",  # r13
    "hll_priority_union",  # r13
    "source_bigram_lm_quality",  # r13
    "part_brand_max_drawdown",  # r13
    "user_value_ewma_band",  # r13
    "user_value_max_drawdown",  # r13
    "cross_doc_repeated_spans",  # r13
    "doc_boilerplate_coverage",  # r13
    "user_value_rolling_band",  # r13
    "part_brand_return_stats",  # r13
    "event_transition_counts",  # r13
    "user_value_gapfill",  # r13
    "orders_priority_pivot",  # r13
    "customer_revenue_deciles",  # r13
    "nation_revenue_running_share",  # r13
    "top_parts_per_nation",  # r13
    "part_fuzzy_name_blocks",  # r13
    "nations_full_priority_coverage",  # r13
    "kmv_priority_intersect",  # r13
    "embedding_label_centroids",  # r13
    "user_rolling_value_7d",  # r13
    "lineitem_quantity_mad_outliers",  # r13
]
