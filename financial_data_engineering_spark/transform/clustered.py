"""Clustered parquet sink — data layout for predicate IO elision.

Parquet stores min/max statistics per row group, and Spark's scan skips
any row group (and any whole file) whose stats exclude the pushed
predicate. Those stats are only useful if the data is CLUSTERED on the
predicate columns: a key scattered uniformly across files makes every
[min, max] span the whole domain and nothing is ever skipped.

``write_clustered_parquet`` is the layout half of that contract:
``repartitionByRange`` on the cluster columns gives a GLOBAL sort-ish
placement (file i holds keys strictly below file i+1's), and
``sortWithinPartitions`` orders rows inside each file so row-group stats
within a file are tight too. The result: a selective filter on the
cluster columns touches ~one file instead of all of them — at 100 TB the
difference between an index-like seek and a full-corpus scan, bought
with one shuffle at write time (the same trade as the bucketed-join
sink, applied to scans instead of joins).

Choose cluster columns by dominant predicate, not by join key: event
tables cluster by (entity, time) for entity timelines, by time alone for
range dashboards. tests/test_scale_layout.py verifies the contract from
the parquet FOOTERS — per-file key ranges must not overlap — and from
the row counts a filtered scan actually reads.
"""

from __future__ import annotations

from financial_data_engineering_spark.operators.zorder import (
    Z_BITS,
    morton_interleave,
)
from financial_data_engineering_spark.partitioning import shuffle_partitions
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    *,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` range-clustered on ``cluster_cols``: one sorted
    parquet file per range partition, with non-overlapping key ranges
    across files."""
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    n = num_files or shuffle_partitions(df.sparkSession)
    (
        df.repartitionByRange(n, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    *,
    bits: int = Z_BITS,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered on the Morton interleave of two columns —
    the layout ``lineitem_zorder_skipping`` (queries/layout.py) audits,
    committed to disk: files cover compact rectangles of the (x, y)
    domain, so footer min/max stats prune selective predicates on
    EITHER column (a linear sort prunes only its leading column).

    Bucket bounds come from one min/max aggregate attached as a 1-row
    broadcast (no collect); the morton key is a pure-JVM bit expression.
    One ``repartitionByRange`` shuffle on the morton key places
    contiguous curve ranges per file, ``sortWithinPartitions`` makes
    row-group stats inside each file tight as well. The helper column
    is dropped before the write — the layout is carried by row
    placement, not schema."""
    n = num_files or shuffle_partitions(df.sparkSession)
    b = 1 << bits
    bounds = df.agg(
        F.min(col_x).alias("_xmin"),
        F.max(col_x).alias("_xmax"),
        F.min(col_y).alias("_ymin"),
        F.max(col_y).alias("_ymax"),
    ).withColumn("_k", F.lit("_"))
    # bucket = (v - min) * B div (max - min + 1): integer, in [0, B)
    bx = F.expr(f"(({col_x} - _xmin) * {b}) div (_xmax - _xmin + 1)")
    by = F.expr(f"(({col_y} - _ymin) * {b}) div (_ymax - _ymin + 1)")
    keyed = (
        df.withColumn("_k", F.lit("_"))
        .join(F.broadcast(bounds), "_k")
        .withColumn("_z", morton_interleave(bx, by, bits))
        .drop("_k", "_xmin", "_xmax", "_ymin", "_ymax")
    )
    (
        keyed.repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )
