"""Token-budget sequence packing: assign ordered items to fixed-budget
bins via a running weight sum — the streaming approximation of packing
documents into training-context windows.

Guarantee: walking each group in ``order_col`` order, item i goes to bin
``floor(weight_before_i / budget)`` — a bin may overflow by at most one
item (the one that crosses the boundary) and a new bin starts only after
the previous ones consumed ≥ their budget. Pure integer arithmetic, one
shuffle (the per-group running-sum window); the follow-up rollup reuses
the window's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum", F.sum(weight_col).over(w))
        .withColumn(
            out_col, F.expr(f"(_cum - {weight_col}) div {int(budget)}")
        )
        .drop("_cum")
    )
