"""Bucketed parquet sink — the co-located-join layout for repeated big
joins (SURVEY §2.A13 extended to the 100 TB tier).

A fact table joined to the same dimension key every day should not
re-shuffle both sides every run. Writing both sides bucketed (same key,
same bucket count) pre-partitions the data on disk: Spark's scan exposes
the bucketing as the join's required distribution, so a sort-merge join
runs with ZERO Exchange nodes — the shuffle happened once, at write time,
instead of once per query. ``sortBy`` on the bucket key additionally
pre-sorts each bucket file, letting the merge phase skip its sort.

Bucketed tables go through the session catalog (``saveAsTable`` — plain
``parquet(path)`` cannot record bucket metadata); on a real deployment
that is a Hive/Glue/Unity metastore, locally it is the spark-warehouse
directory. Bucket count should be sized so one bucket of the FACT side
fits an executor core's working set (rule of thumb: total fact size /
bucket_count ≈ 100-500 MB); both join sides must use the same count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int,
    *,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog-registered parquet table bucketed (and
    optionally per-bucket sorted) on ``bucket_keys``."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_keys[0], *bucket_keys[1:])
    )
    if sort_keys:
        writer = writer.sortBy(sort_keys[0], *sort_keys[1:])
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata rides along from the
    catalog, so joins/aggregations on the bucket key skip their
    Exchange)."""
    return spark.table(table)
