"""Query registry: every operator exposed as a named (spark_fn, oracle_sql) pair.

Importing this package loads all query modules, populating the registry that
``__spark_entry__.py`` exports to the correctness driver.
"""

from financial_data_engineering_spark.queries.registry import (
    all_oracles,
    all_queries,
    get,
    register,
    reorder,
)

# Import for registration side effects (import order no longer matters —
# the driver gate window is the explicit GATE_WINDOW list below).
from financial_data_engineering_spark.queries import analytics_ext  # noqa: E402,F401
from financial_data_engineering_spark.queries import audits  # noqa: E402,F401
from financial_data_engineering_spark.queries import curation  # noqa: E402,F401
from financial_data_engineering_spark.queries import dedup  # noqa: E402,F401
from financial_data_engineering_spark.queries import dimensional  # noqa: E402,F401
from financial_data_engineering_spark.queries import events  # noqa: E402,F401
from financial_data_engineering_spark.queries import multimodal  # noqa: E402,F401
from financial_data_engineering_spark.queries import quality  # noqa: E402,F401
from financial_data_engineering_spark.queries import relational  # noqa: E402,F401
from financial_data_engineering_spark.queries import relational_ext  # noqa: E402,F401
from financial_data_engineering_spark.queries import similarity  # noqa: E402,F401
from financial_data_engineering_spark.queries import sketch  # noqa: E402,F401
from financial_data_engineering_spark.queries import text  # noqa: E402,F401

#: The driver verifies a bounded (~50) window from the registry head each
#: round. Priority for a slot, highest first: (1) queries never
#: driver-verified with their CURRENT output — new registrations and any
#: query whose fn/oracle changed since its last driver-green row; (2)
#: longest-unverified rotations. Everything after position 50 was
#: driver-green in r4 with unchanged semantics.
#:
#: ROUND-6 ROTATION PLAN: the r4-green families left out of this window —
#: similarity (6), sketch (2), relational_ext (3), text (5), curation
#: core (9), dedup core (8), multimodal_decode_stats, user_sessions /
#: events_value_histogram / user_retention_cohorts — go to the front next
#: round, together with the four unchanged-since-r3 rotations displaced
#: by never-verified round-5 queries (event_type_counts,
#: customers_without_orders, top_part_nouns, customer_padded_keys); the
#: families verified here rotate out.
GATE_WINDOW = [
    # r4 hash-red rows, fixed in r5 (CAST ... AS BIGINT oracle typing)
    "multimodal_resize_stats",
    "multimodal_frame_stats",
    "doc_mix_rebalance",
    # earlier round-5 additions, never driver-verified
    "doc_split_assign",
    "kmv_priority_intersect",
    "embedding_label_centroids",
    "user_rolling_value_7d",
    "lineitem_quantity_mad_outliers",
    "ann_rrf_fusion",
    "event_props_rollup",
    "dedup_incremental_new_unique",
    "dedup_group_representatives",
    "dedup_incremental_minhash",
    # round-5 analytics extensions, never driver-verified
    "event_transition_counts",
    "user_value_gapfill",
    "orders_priority_pivot",
    "customer_revenue_deciles",
    "nation_revenue_running_share",
    "top_parts_per_nation",
    "part_fuzzy_name_blocks",
    "nations_full_priority_coverage",
    "bpe_merge_candidates",
    "bpe_learned_merges",
    "sliding_active_users",
    "priority_fulfillment_latency",
    "user_browse_to_buy_runs",
    # r4-green rows whose oracles were converted to exact integers in r5
    # (ed06a8e) — the green rows are stale against the new output
    "hourly_event_rollup",
    "sliding_event_counts",
    "event_funnel_pairs",
    "events_asof_latest_order",
    "event_rollup_grouping_sets",
    # last driver-green in r3; outputs since converted to exact integers
    "pricing_summary",
    "latest_order_per_customer",
    "top_customers_by_revenue",
    "nation_latest_order_revenue",
    "order_distinct_counts",
    "lineitem_global_stats",
    "high_value_parties",
    "revenue_by_region_segment",
    "order_priority_share",
    "date_dimension",
    "surrogate_keys_nation",
    "fact_orders_star",
    "customer_priority_scd2",
    "lineitem_priority_asof",
    "quality_freshness_events",
    "quality_completeness_lineitem",
    "quality_uniqueness_orders",
    "quality_range_quantity",
    "quality_pattern_customer_name",
]

reorder(GATE_WINDOW)

__all__ = ["all_oracles", "all_queries", "get", "register", "reorder"]
