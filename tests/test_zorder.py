"""Z-order layout evaluation (operators/zorder.py): interleave
correctness vs a pure-Python reference, Spark/SQL generator parity, and
the slice-replay arithmetic on a hand grid."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators.zorder import (
    Z_BITS,
    cell_histogram,
    layout_skipping_stats,
    morton_interleave,
    morton_interleave_sql,
)


def _py_morton(bx: int, by: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((bx >> i) & 1) << (2 * i + 1)
        out |= ((by >> i) & 1) << (2 * i)
    return out


def test_morton_matches_python_reference(spark):
    grid = [(bx, by) for bx in range(16) for by in range(16)]
    df = spark.createDataFrame(grid, "bx long, by long")
    got = {
        (r["bx"], r["by"]): r["m"]
        for r in df.select(
            "bx", "by", morton_interleave(F.col("bx"), F.col("by")).alias("m")
        ).collect()
    }
    for bx, by in grid:
        assert got[(bx, by)] == _py_morton(bx, by, Z_BITS)
    # bijective over the grid
    assert sorted(got.values()) == list(range(256))


def test_morton_sql_generator_matches_column(spark):
    """The SQL text and the Catalyst column must be the same function —
    evaluated here cell-by-cell via DuckDB vs Spark."""
    sql = morton_interleave_sql("bx", "by")
    rows = duckdb.sql(
        "SELECT bx, by, "
        + sql
        + " AS m FROM (SELECT r1.range AS bx, r2.range AS by"
        "   FROM range(16) r1, range(16) r2)"
    ).fetchall()
    for bx, by, m in rows:
        assert m == _py_morton(bx, by, Z_BITS)


def test_morton_preserves_locality_blocks(spark):
    """file = morton >> 2 must cover a 2x2 (bx, by) square — the reason
    z-order prunes BOTH dims with range 2."""
    for bx in range(16):
        for by in range(16):
            f = _py_morton(bx, by, Z_BITS) >> 2
            # all four cells of the aligned 2x2 block share the file
            assert _py_morton(bx & ~1, by & ~1, Z_BITS) >> 2 == f


def test_layout_stats_hand_grid(spark):
    # 2-bit world: 4x4 grid, 16 cells, file = cell >> 2 -> 4 files.
    cells = spark.createDataFrame(
        [(bx, by, 1) for bx in range(4) for by in range(4)],
        "bx long, by long, n_rows long",
    )
    linear = {
        (r["dim"]): (r["n_files"], r["files_scanned"], r["rows_scanned"])
        for r in layout_skipping_stats(
            cells, "linear", F.col("bx") * 4 + F.col("by"), shift=2
        ).collect()
    }
    # linear files each cover one bx (range 1) and all four by (range 4)
    assert linear["bx"] == (4, 4, 16)
    assert linear["by"] == (4, 16, 64)
    zorder = {
        (r["dim"]): (r["n_files"], r["files_scanned"], r["rows_scanned"])
        for r in layout_skipping_stats(
            cells, "zorder", morton_interleave(F.col("bx"), F.col("by"), 2),
            shift=2,
        ).collect()
    }
    # morton files are 2x2 squares: both dims prune to range 2
    assert zorder["bx"] == (4, 8, 32)
    assert zorder["by"] == (4, 8, 32)


def test_cell_histogram_counts(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,)], "v long"
    )
    cells = cell_histogram(df, F.col("v"), F.lit(0))
    got = {(r["bx"], r["by"]): r["n_rows"] for r in cells.collect()}
    assert got == {(1, 0): 2, (2, 0): 1}


def test_zorder_query_runs_and_orders(spark):
    from financial_data_engineering_spark.queries.layout import (
        lineitem_zorder_skipping,
    )

    rows = lineitem_zorder_skipping(spark, "/root/testdata/sf0.001").collect()
    assert [(r["layout"], r["dim"]) for r in rows] == [
        ("linear", "partkey"),
        ("linear", "suppkey"),
        ("zorder", "partkey"),
        ("zorder", "suppkey"),
    ]
    by_key = {(r["layout"], r["dim"]): r for r in rows}
    # the headline claim: z-order beats linear on the TRAILING dim and
    # the two z-order dims are balanced
    assert (
        by_key[("zorder", "suppkey")]["files_scanned"]
        < by_key[("linear", "suppkey")]["files_scanned"]
    )
    assert (
        by_key[("linear", "partkey")]["files_scanned"]
        <= by_key[("zorder", "partkey")]["files_scanned"]
    )
