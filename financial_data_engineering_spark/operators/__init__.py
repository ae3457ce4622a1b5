from financial_data_engineering_spark.operators.relational import (
    anti_join_orphans,
    argmax_per_group,
    duplicate_row_count,
    topk,
    union_frames,
    value_counts,
)
from financial_data_engineering_spark.operators.asof import asof_join
from financial_data_engineering_spark.operators.sketch import kmv_distinct

__all__ = [
    "anti_join_orphans",
    "argmax_per_group",
    "asof_join",
    "kmv_distinct",
    "duplicate_row_count",
    "topk",
    "union_frames",
    "value_counts",
]
