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
from financial_data_engineering_spark.queries import finance  # noqa: E402,F401
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
#: ROUND-6 WINDOW (executes the rotation plan written in round 5): the
#: two queries no driver round has ever checked go first, then the one
#: new round-6 registration (ann_ivf_from_index), then every family whose
#: last driver-green row is r4 or older — similarity, sketch, text,
#: curation core, dedup core, the three event rows, multimodal_decode,
#: the four displaced relational rotations, and the five relational_ext
#: rows. After this round every registered query has a driver-green row
#: from r5 or r6 — the two-round rotation invariant holds registry-wide.
#: Everything after this window was driver-green in r5 with unchanged
#: output values (the round-6 broadcast-hint demotions change plans, not
#: values; the running-share DECIMAL widening changes neither value nor
#: dtype at any tested SF — all re-verified by the local strict gate).
#:
#: ROUND-7 ROTATION PLAN: dedup_bloom_screen,
#: order_priority_delayed_counts, part_brand_vwap, customer_order_gaps,
#: user_value_twap, and event_type_cm_audit (registered after this
#: window filled;
#: strict-green at sf0.01 AND sf0.1 in the committed local gate logs)
#: go FIRST, followed by the round-6 registrations and whichever families
#: this round re-confirmed that are then the oldest greens (relational
#: core, dimensional, quality, events, analytics_ext, multimodal
#: resize/frame, incremental dedup, sketch-intersect, audits).
GATE_WINDOW = [
    # never driver-verified (registered after the r5 gate ran)
    "event_value_dispersion",
    "lineitem_measure_unpivot",
    # new round-6 registrations: IVF index build/serve round-trip,
    # SemDeDup-style clustered semantic dedup, skew-salted join under
    # oracle, segment vocabulary overlap, and the Q17 correlated-agg shape
    "ann_ivf_from_index",
    "dedup_semantic_clusters",
    "customer_order_stats_salted",
    "source_vocab_overlap",
    "small_quantity_order_revenue",
    # similarity family (last green r4)
    "knn_brute_force_cosine",
    "ann_lsh_cosine",
    "ann_lsh_multiprobe",
    "embedding_quantization_stats",
    "ann_ivf_cosine",
    # sketch family (last green r4)
    "kmv_distinct_customers",
    "kmv_priority_union",
    # text family (last green r4)
    "doc_text_stats",
    "doc_lang_id",
    "source_quality_rollup",
    "doc_fingerprints",
    "doc_bpe_tokens",
    # curation core (last green r4)
    "doc_sample_stratified",
    "doc_pack_bins",
    "source_vocab_stats",
    "top_bigrams",
    "doc_repetition_flags",
    "doc_chunks",
    "tfidf_top_terms",
    "pii_scrub_stats",
    "doc_dense_ids",
    # dedup core (last green r4)
    "eval_contamination",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_winnowing",
    "dedup_exact_survivors",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_pairs",
    "dedup_component_groups",
    # event rows left out of r5 (last green r4)
    "user_sessions",
    "events_value_histogram",
    "user_retention_cohorts",
    # multimodal decode (last green r4)
    "multimodal_decode_stats",
    # relational rotations displaced by round-5 registrations (last green r3/r4)
    "event_type_counts",
    "customers_without_orders",
    "top_part_nouns",
    "customer_padded_keys",
    # relational_ext rows (last green r4)
    "order_week_shipments",
    "lineitem_price_quantiles",
    "customer_overlapping_orders",
    "shipping_priority_revenue",
    "region_local_supplier_volume",
]

reorder(GATE_WINDOW)

__all__ = ["all_oracles", "all_queries", "get", "register", "reorder"]
