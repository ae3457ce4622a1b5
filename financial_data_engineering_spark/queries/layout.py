"""Data-layout planning queries: quantify file-skipping BEFORE a rewrite
job commits 100 TB to a clustering choice.

The reference engine has no layout module (its corpus fits one node);
this family is the Spark-native answer to the question its users hit at
scale: "sort by partkey, or Z-order by (partkey, suppkey)?" — answered
from per-file min/max stats the same way a parquet reader prunes row
groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators.zorder import (
    Z_BITS,
    Z_FILE_SHIFT,
    cell_histogram,
    layout_skipping_stats,
    morton_interleave,
    morton_interleave_sql,
)
from financial_data_engineering_spark.partitioning import materialize
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

_B = 1 << Z_BITS  # buckets per dimension


def _zorder_oracle() -> str:
    """Replay of the full layout comparison, generated from the SAME
    grid constants and the same interleave-expression generator the
    Spark operator uses (drift-proof). Every sum is cast to BIGINT
    (DuckDB promotes integer sums to HUGEINT, which the driver's
    dtype-sensitive hash would flag)."""
    morton = morton_interleave_sql("bx", "by", Z_BITS)
    layouts = {
        "zorder": f"({morton})",
        "linear": f"(bx * {_B} + by)",
    }
    arms = []
    for layout, cell in layouts.items():
        for dim, col in (("partkey", "bx"), ("suppkey", "by")):
            arms.append(f"""
    SELECT '{layout}' AS layout, '{dim}' AS dim,
           count(*) AS n_files,
           CAST(sum(max_{col} - min_{col} + 1) AS BIGINT) AS files_scanned,
           CAST(sum(n_rows * (max_{col} - min_{col} + 1)) AS BIGINT)
               AS rows_scanned
    FROM (
        SELECT {cell} >> {Z_FILE_SHIFT} AS file,
               CAST(sum(n_rows) AS BIGINT) AS n_rows,
               min(bx) AS min_bx, max(bx) AS max_bx,
               min(by) AS min_by, max(by) AS max_by
        FROM cells GROUP BY 1
    ) GROUP BY 1, 2""")
    union = "\n    UNION ALL".join(arms)
    return f"""
    WITH mx AS (
        SELECT max(l_partkey) AS mpk, max(l_suppkey) AS msk FROM lineitem
    ),
    cells AS (
        SELECT ((l_partkey - 1) * {_B}) // mpk AS bx,
               ((l_suppkey - 1) * {_B}) // msk AS by,
               count(*) AS n_rows
        FROM lineitem CROSS JOIN mx
        GROUP BY 1, 2
    )
    {union}
    ORDER BY layout, dim
    """


@register("lineitem_zorder_skipping", oracle=_zorder_oracle())
def lineitem_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compare two candidate file layouts for lineitem — linear
    (partkey-major sort) vs Z-order over (partkey, suppkey) — by total
    file opens and rows read across all single-value slice queries on
    each dimension, computed from per-file min/max stats exactly the
    way a parquet reader prunes row groups.

    The corpus pays ONE aggregate down to the (bx, by) grid (<= 256
    cells at 4 bits/dim); both layouts and all 32 probe queries are
    then arithmetic over that control-plane frame — a file spanning r
    values of a dim is hit by exactly r slices, so no probe join exists
    in the plan (operators/zorder.py). Expected shape, and why Z-order
    wins mixed workloads: linear prunes its leading column perfectly
    (range 1 per file) but reads every file for the trailing one
    (16/16); morton files cover 2x2 squares, so BOTH dims prune to
    range 2. The bucket bounds come from max-key 1-row broadcasts, and
    the same morton expression generator emits the Spark column and the
    oracle SQL."""
    li = load(spark, "lineitem", sf_dir)
    mx = (
        li.agg(
            F.max("l_partkey").alias("mpk"),
            F.max("l_suppkey").alias("msk"),
        )
        .withColumn("_k", F.lit("_"))
    )
    # materialize the <= 256-row histogram: the four layout/dim arms
    # below would otherwise each re-run the corpus aggregate (4 scans
    # of lineitem for one answer)
    cells = materialize(
        cell_histogram(
            li.withColumn("_k", F.lit("_")).join(F.broadcast(mx), "_k"),
            F.expr(f"((l_partkey - 1) * {_B}) div mpk"),
            F.expr(f"((l_suppkey - 1) * {_B}) div msk"),
        )
    )
    zorder = layout_skipping_stats(
        cells, "zorder", morton_interleave(F.col("bx"), F.col("by"), Z_BITS)
    )
    linear = layout_skipping_stats(
        cells, "linear", F.col("bx") * _B + F.col("by")
    )
    out = zorder.unionByName(linear).withColumn(
        "dim",
        F.when(F.col("dim") == "bx", F.lit("partkey")).otherwise(
            F.lit("suppkey")
        ),
    )
    return out.orderBy("layout", "dim")
