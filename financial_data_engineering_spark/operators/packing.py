"""Token-budget sequence packing: assign ordered items to fixed-budget
bins via a running weight sum — the streaming approximation of packing
documents into training-context windows.

Guarantee: walking each group in ``order_col`` order, item i goes to bin
``floor(weight_before_i / budget)`` — a bin may overflow by at most one
item (the one that crosses the boundary) and a new bin starts only after
the previous ones consumed ≥ their budget. Pure integer arithmetic. The
running sum is the distributed two-level prefix sum of
operators/prefix.py — a group-partitioned window would cap parallelism
at |groups| (the registry-wide low-cardinality plan audit bans exactly
that shape over data-scale frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators.prefix import running_sum


def pack_bins(
    df: DataFrame,
    group_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
    *,
    out_col: str = "bin_id",
) -> DataFrame:
    """Add ``out_col`` = floor(running ``weight_col`` sum BEFORE this row /
    ``budget``), running per ``group_col`` in ``order_col`` order."""
    return (
        running_sum(df, group_col, [order_col], weight_col, out_col="_cum")
        .withColumn(
            out_col, F.expr(f"(_cum - {weight_col}) div {int(budget)}")
        )
        .drop("_cum")
    )
