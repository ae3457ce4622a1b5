"""Z-order (Morton) data-layout evaluation.

At 100 TB the scan you avoid is the fastest scan: clustering files on a
space-filling curve over two predicate columns lets min/max file stats
prune box queries on EITHER column, where a linear sort prunes only its
leading column. These helpers quantify that trade BEFORE a rewrite job
commits to a layout:

- ``morton_interleave`` builds the bit-interleaved cell id as a Catalyst
  column expression (pure JVM bit arithmetic, codegen-friendly);
- ``layout_skipping_stats`` compares candidate file layouts by replaying
  every single-value slice query per dimension against each layout's
  per-file min/max ranges — entirely ARITHMETICALLY: a file whose dim
  range spans r values is hit by exactly r of the slice queries, so the
  scan totals are sums over file stats, no probe join.

Scale shape: the corpus pays ONE aggregate down to the (bx, by) cell
grid (at most 2^(2*bits) rows — 256 cells at the default 4 bits);
every layout comparison after that is control-plane arithmetic. The
write path a chosen layout implies is ``df.repartitionByRange(n_files,
morton).sortWithinPartitions(morton)`` — contiguous morton ranges per
file, which the ``file = cell >> shift`` model here mirrors exactly on
a uniform grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Grid resolution per dimension (bits) and cells-per-file shift, shared
#: with the oracle generator (queries/layout.py) so query and oracle
#: cannot drift.
Z_BITS = 4
Z_FILE_SHIFT = 2


def morton_interleave(bx: Column, by: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` of two bucket ids: bit i of ``bx``
    lands at position 2i+1, bit i of ``by`` at 2i."""
    out = F.lit(0)
    for i in range(bits):
        out = (
            out
            + F.shiftleft(F.shiftright(bx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(by, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return out


def morton_interleave_sql(bx: str, by: str, bits: int = Z_BITS) -> str:
    """The identical interleave as ANSI/DuckDB SQL text, generated from
    the same constants (drift-proof oracle construction)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({bx} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({by} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def cell_histogram(
    df: DataFrame, bx: Column, by: Column
) -> DataFrame:
    """ONE data-side aggregate: row counts per (bx, by) grid cell. All
    layout evaluation downstream runs on this <= 2^(2*bits)-row frame."""
    return (
        df.select(bx.alias("bx"), by.alias("by"))
        .groupBy("bx", "by")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def layout_skipping_stats(
    cells: DataFrame, layout: str, cell_col: Column, shift: int = Z_FILE_SHIFT
) -> DataFrame:
    """Skipping totals for one layout: assign ``file = cell >> shift``,
    collect per-file (min, max) of each dim and row counts, then replay
    all 2^bits single-value slice queries per dim arithmetically — a
    file spanning r values of a dim is scanned by exactly r slices.

    Returns one row per dim: layout, dim, n_files, files_scanned (file
    opens summed over all slices — lower = better pruning) and
    rows_scanned (rows read including false positives)."""
    files = (
        cells.withColumn("file", F.shiftright(cell_col, shift))
        .groupBy("file")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("bx").alias("min_bx"),
            F.max("bx").alias("max_bx"),
            F.min("by").alias("min_by"),
            F.max("by").alias("max_by"),
        )
    )
    dims = [("bx", "min_bx", "max_bx"), ("by", "min_by", "max_by")]
    parts = []
    for dim, lo, hi in dims:
        span = F.col(hi) - F.col(lo) + 1
        parts.append(
            files.agg(
                F.count(F.lit(1)).alias("n_files"),
                F.sum(span).alias("files_scanned"),
                F.sum(F.col("n_rows") * span).alias("rows_scanned"),
            ).select(
                F.lit(layout).alias("layout"),
                F.lit(dim).alias("dim"),
                "n_files",
                "files_scanned",
                "rows_scanned",
            )
        )
    return parts[0].unionByName(parts[1])
