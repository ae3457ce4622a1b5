"""Distributed per-group prefix sums — no group-keyed global sort.

A running sum (or rank: a running sum of 1) partitioned only by a
LOW-CARDINALITY group column caps parallelism at |groups|: 20 sources
means 20 tasks each sorting 1/20th of a 100 TB corpus. This operator is
the generic fix, the same two-level shape the finance family uses for
month-segmented folds and operators/ids.py uses for dense ids:

1. ``repartitionByRange(n, group, *order)`` spreads every group across
   ``n`` partitions while keeping (group, order) contiguous, and the
   frame is materialized so the sampled range boundaries — and with
   them ``spark_partition_id()`` — are FROZEN between the two consumers
   (ids.py documents the hazard: each execution re-samples boundaries).
2. Per-(group, partition) totals aggregate map-side into a
   control-plane frame (≤ n·|groups| rows); a window over THAT frame
   turns them into per-partition starting offsets. This is the only
   group-partitioned window left, and it runs post-aggregate.
3. The local running sum windows by (group, partition-id) — full n-way
   parallelism — and the broadcast offset join lifts it to the global
   prefix sum, exactly (integer addition is associative; no
   approximation anywhere).

Cost vs the single window: one extra materialized pass plus a broadcast
join, in exchange for parallelism n instead of |groups| on the sort —
the round-8-measured trade (quantiles 10.4→1.9 s, drawdown 4.7→2.3 s at
sf1) applied to the curation family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.partitioning import (
    materialize,
    shuffle_partitions,
)


def running_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    weight: Column | str,
    out_col: str = "_cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = inclusive running sum of ``weight`` per
    ``group_col`` in ``order_cols`` order (ties must not exist — pass a
    unique tiebreaker as the last order column). For a dense 1-based
    rank, pass ``weight=F.lit(1)``."""
    spark = df.sparkSession
    n = num_partitions or shuffle_partitions(spark)
    wcol = F.col(weight) if isinstance(weight, str) else weight
    ranged = materialize(
        df.repartitionByRange(
            n, F.col(group_col), *[F.col(c) for c in order_cols]
        )
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_w", wcol)
    )
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        ranged.groupBy(group_col, "_pid")
        .agg(F.sum("_w").alias("_wsum"))
        .withColumn("_off", F.coalesce(F.sum("_wsum").over(w_off), F.lit(0)))
        .select(group_col, "_pid", "_off")
    )
    w_local = (
        Window.partitionBy(group_col, "_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ranged.withColumn("_lcum", F.sum("_w").over(w_local))
        .join(F.broadcast(offsets), [group_col, "_pid"])
        .withColumn(out_col, F.col("_off") + F.col("_lcum"))
        .drop("_lcum", "_off", "_pid", "_w")
    )
