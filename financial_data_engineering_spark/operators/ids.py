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

from financial_data_engineering_spark.partitioning import materialize, shuffle_partitions


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
    out, _ = _dense_ids_with_total(df, order_cols, id_name, num_partitions)
    return out


def _dense_ids_with_total(
    df: DataFrame,
    order_cols: list[str],
    id_name: str,
    num_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Shared core: ids frame plus the total row count (already known from
    the offsets pass — no extra job)."""
    spark = df.sparkSession
    n = num_partitions or shuffle_partitions(spark)
    cols = [F.col(c) for c in order_cols]
    # materialize() freezes the range partitioning: repartitionByRange
    # samples bounds per execution, so without materialization the count
    # pass and the rank pass could see DIFFERENT partitionings and the
    # offsets would be wrong (and on a cluster the blocks must survive
    # executor loss — see partitioning.materialize).
    ranged = materialize(
        df.repartitionByRange(n, *cols)
        .withColumn("_pid", F.spark_partition_id())
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
    out = (
        ranged.withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(off_df), "_pid")
        .withColumn(id_name, F.col("_off") + F.col("_rk"))
        .drop("_pid", "_rk", "_off")
    )
    return out, acc


def scalable_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    bucket_name: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``NTILE(k) OVER (ORDER BY order_cols)`` without the one-partition
    window.

    ``ntile`` needs every row's global rank, and Spark's window
    implementation computes that by sorting the whole input in a single
    task. Here the rank comes from :func:`dense_row_ids` (range
    partitions + driver offsets), and the bucket is pure arithmetic on
    (rank, n, k) reproducing SQL-standard NTILE remainder semantics: the
    first ``n % k`` buckets get ``n div k + 1`` rows, the rest ``n div k``.

    ``order_cols`` must be a unique key (add a tiebreak column) — the same
    precondition deterministic NTILE has in any engine.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ranked, n = _dense_ids_with_total(df, order_cols, "_seq", num_partitions)
    q, rem = divmod(n, k)
    cutoff = (q + 1) * rem
    # Guard q=0 (n < k): cutoff == n, so the otherwise-branch is never
    # taken, but its expression must still be well-formed.
    qs = max(q, 1)
    bucket = F.when(
        F.col("_seq") <= cutoff,
        F.expr(f"(_seq + {q}) div {q + 1}"),
    ).otherwise(F.expr(f"{rem} + (_seq - {cutoff} + {qs} - 1) div {qs}"))
    return ranked.withColumn(bucket_name, bucket.cast("long")).drop("_seq")
