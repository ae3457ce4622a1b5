"""Dense global row numbering at scale.

The naive ``row_number().over(Window.orderBy(...))`` moves EVERY row into
one partition (Spark warns, then does it anyway) — the classic scale trap
for "give each training sample a contiguous id". The distributed pattern:

1. range-repartition by the order key (partition i holds keys < partition
   i+1's — a distributed sort), and FREEZE that partitioning;
2. count rows per partition — |partitions| numbers, pure control plane;
3. prefix-sum those counts driver-side into per-partition offsets;
4. final id = partition offset + local rank (a window WITHIN each
   partition — no global shuffle of data into one task).

The result equals ``row_number() OVER (ORDER BY order_cols)`` exactly
(range partitions are totally ordered), but the largest single task is
one partition's sort, not the whole table's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_row_ids(
    df: DataFrame,
    order_cols: list[str],
    id_name: str = "seq_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based dense global id ordered by ``order_cols`` (which
    must form a unique key for a deterministic result). Equivalent to a
    global ``row_number()`` but computed with per-partition ranks plus
    driver-side offsets (|partitions| longs — control plane, not data).
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    # localCheckpoint freezes the range partitioning: repartitionByRange
    # samples bounds per execution, so without materialization the count
    # pass and the rank pass could see DIFFERENT partitionings and the
    # offsets would be wrong.
    ranged = (
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    sizes = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        ranged.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_name, F.col("_off") + F.col("_rk"))
        .drop("_pid", "_rk", "_off")
    )
