from financial_data_engineering_spark.operators.relational import (
    anti_join_orphans,
    argmax_per_group,
    duplicate_row_count,
    topk,
    union_frames,
    value_counts,
)
from financial_data_engineering_spark.operators.asof import asof_join
from financial_data_engineering_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_screen,
)
from financial_data_engineering_spark.operators.countmin import (
    count_min_build,
    count_min_estimate,
    count_min_merge,
)
from financial_data_engineering_spark.operators.entity import (
    blocked_name_match_stats,
)
from financial_data_engineering_spark.operators.finance import (
    ewma_band_fold,
    ewma_band_merge,
    ewma_band_state,
    ohlc_bars,
)
from financial_data_engineering_spark.operators.heavyhitters import (
    merge_summaries,
    misra_gries_topk,
)
from financial_data_engineering_spark.operators.quantilesketch import (
    grouped_quantile_sketch,
    grouped_sketch_quantiles,
    quantile_sketch,
    sketch_quantiles,
)
from financial_data_engineering_spark.operators.ids import (
    dense_row_ids,
    scalable_ntile,
)
from financial_data_engineering_spark.operators.sequences import (
    pattern_run_counts,
    transition_counts,
)
from financial_data_engineering_spark.operators.timeseries import locf_daily_fill
from financial_data_engineering_spark.operators.mixing import (
    mixture_quotas,
    mixture_rebalance,
)
from financial_data_engineering_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)
from financial_data_engineering_spark.operators.sketch import (
    kmv_distinct,
    kmv_distinct_from_hashes,
    kmv_group_sketches,
)
from financial_data_engineering_spark.operators.graph import (
    copurchase_edges,
    kcore_bounded,
    kcore_exact,
    pagerank_integer,
)
from financial_data_engineering_spark.operators.cdc import (
    apply_changelog,
    last_change_per_key,
)
from financial_data_engineering_spark.operators.zorder import (
    cell_histogram,
    layout_skipping_stats,
    morton_interleave,
)

__all__ = [
    "anti_join_orphans",
    "apply_changelog",
    "argmax_per_group",
    "asof_join",
    "cell_histogram",
    "blocked_name_match_stats",
    "bloom_build",
    "bloom_merge",
    "bloom_screen",
    "count_min_build",
    "count_min_estimate",
    "count_min_merge",
    "copurchase_edges",
    "dense_row_ids",
    "ewma_band_fold",
    "ewma_band_merge",
    "ewma_band_state",
    "ohlc_bars",
    "grouped_quantile_sketch",
    "grouped_sketch_quantiles",
    "duplicate_row_count",
    "interval_overlap_join",
    "kcore_bounded",
    "kcore_exact",
    "kmv_distinct",
    "kmv_distinct_from_hashes",
    "kmv_group_sketches",
    "last_change_per_key",
    "layout_skipping_stats",
    "locf_daily_fill",
    "morton_interleave",
    "merge_summaries",
    "misra_gries_topk",
    "mixture_quotas",
    "mixture_rebalance",
    "pagerank_integer",
    "pattern_run_counts",
    "point_in_interval_join",
    "quantile_sketch",
    "scalable_ntile",
    "sketch_quantiles",
    "topk",
    "transition_counts",
    "union_frames",
    "value_counts",
]
