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

from financial_data_engineering_spark.partitioning import shuffle_partitions
from pyspark.sql import DataFrame


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
