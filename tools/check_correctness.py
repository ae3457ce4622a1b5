"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the given
scale factor, compares row count, sorted-column schema, and an
order-insensitive value hash. Use while iterating so mismatches surface
before the driver's round check.

Usage: python tools/check_correctness.py [--strict] [sf_dir] [query ...]

``--strict`` compares floats by full-precision ``repr`` instead of the
9-digit canonicalization — stricter than any plausible driver comparator,
so a strict-green query cannot flip red on rounding grounds.
"""

from __future__ import annotations

import gc
import os
import hashlib
import sys

import duckdb

sys.path.insert(0, ".")

from financial_data_engineering_spark import queries as q
from financial_data_engineering_spark.schemas import TPCH_TABLES
from financial_data_engineering_spark.session import get_spark

STRICT = False


def value_hash(rows: list[tuple], columns: list[str]) -> str:
    """Order-insensitive hash over stringified cells, columns sorted by name."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = sorted(
        "\x1f".join(_cell(row[i]) for i in order) for row in rows
    )
    return hashlib.md5("\x1e".join(canon).encode()).hexdigest()


def _cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        return repr(v) if STRICT else repr(round(v, 9))
    return str(v)


#: DuckDB int128 types. The driver's value hash is dtype-sensitive, so an
#: oracle emitting these (bare ``sum()``, ``//`` over a sum-derived operand)
#: hash-mismatches Spark's BIGINT even when every value is equal — the exact
#: failure mode of the three r4 red rows. Hard-fail locally.
_HUGE = {"HUGEINT", "UHUGEINT"}


def _type_class(t: str) -> str:
    """Collapse a Spark dtype / DuckDB type string to a comparable class."""
    t = t.strip().upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.endswith("[]") or t.startswith("ARRAY"):
        return "array"
    if t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    if t in {
        "TINYINT", "SMALLINT", "INTEGER", "INT", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    }:
        return "int"
    if t in {"FLOAT", "REAL", "DOUBLE"}:
        return "float"
    if t in {"VARCHAR", "STRING", "TEXT", "CHAR"}:
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t in {"BLOB", "BINARY"}:
        return "binary"
    return t.lower()


def _dtype_problems(s_dtypes, o_cols, o_types) -> list[str]:
    """HUGEINT columns and Spark-vs-DuckDB type-class divergence."""
    problems = []
    huge = [
        f"{c}:{t}"
        for c, t in zip(o_cols, o_types)
        if str(t).upper() in _HUGE
    ]
    if huge:
        problems.append(
            f"oracle int128 column(s) {huge} — CAST(... AS BIGINT); "
            "driver hash is dtype-sensitive"
        )
    s_map = {c: _type_class(t) for c, t in s_dtypes}
    o_map = {c: _type_class(str(t)) for c, t in zip(o_cols, o_types)}
    diverged = [
        f"{c}: spark {s_map[c]} vs oracle {o_map[c]}"
        for c in sorted(set(s_map) & set(o_map))
        if s_map[c] != o_map[c]
    ]
    if diverged:
        problems.append("dtype class mismatch: " + "; ".join(diverged))
    return problems


def main() -> int:
    global STRICT
    args = sys.argv[1:]
    if args and args[0] == "--strict":
        STRICT = True
        args = args[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    spark = get_spark("correctness-check")
    # Huge-SF evidence runs: push checkpoint blocks to disk (or a
    # serialized level) so live round frames don't compete with the
    # query's own execution memory. See partitioning.materialize.
    level = os.environ.get("FDES_MATERIALIZE_LEVEL")
    if level:
        spark.conf.set("spark.fdes.materialize.storageLevel", level)

    con = duckdb.connect()
    # cap the oracle engine so it SPILLS under pressure instead of
    # failing: DuckDB's default limit is 80% of physical RAM, which is a
    # lie once the Spark JVM holds a large heap in the same box (the
    # sf10 doc_bpe_encoding oracle died on exactly this).
    con.execute(
        f"SET memory_limit='{os.environ.get('FDES_DUCKDB_MEM', '32GB')}'"
    )
    # DuckDB only creates the LEAF directory of temp_directory — a
    # missing parent fails the first spill with "IO Error: Failed to
    # create directory" (the r10 sf10 kcore oracle died on this after a
    # clean checkout dropped the ignored .tmp/). Create the full path.
    os.makedirs(".tmp/duckdb_spill", exist_ok=True)
    con.execute("SET temp_directory='.tmp/duckdb_spill'")
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = q.all_queries()
    oracles = q.all_oracles()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_dtypes = sdf.dtypes
            s_rows = [tuple(r) for r in sdf.collect()]
            spark.catalog.clearCache()  # drop operator-persisted intermediates
            # localCheckpoint blocks are NOT catalog-cached: they release
            # only when the driver-side references die and ContextCleaner
            # runs. Without this, a multi-query session accumulates every
            # materialized frame (the sf10 spot gate OOM-killed the JVM at
            # 82 GB RSS on exactly this).
            del sdf
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            o_cols = rel.columns
            o_types = [str(t) for t in rel.types]
            o_rows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {exc}")
            continue
        problems = []
        if len(s_rows) != len(o_rows):
            problems.append(f"rows {len(s_rows)} vs {len(o_rows)}")
        if sorted(s_cols) != sorted(o_cols):
            problems.append(f"cols {sorted(s_cols)} vs {sorted(o_cols)}")
        else:
            problems.extend(_dtype_problems(s_dtypes, o_cols, o_types))
            if value_hash(s_rows, s_cols) != value_hash(o_rows, o_cols):
                problems.append("value hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value hash mismatch" in problems:
                _show_diff(s_rows, s_cols, o_rows, o_cols)
        else:
            print(f"OK    {name} ({len(s_rows)} rows)")
    print(f"\n{len(failures)} failures" if failures else "\nall green")
    return 1 if failures else 0


def _show_diff(s_rows, s_cols, o_rows, o_cols, limit=3):
    order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    order_o = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
    s_set = sorted("|".join(_cell(r[i]) for i in order_s) for r in s_rows)
    o_set = sorted("|".join(_cell(r[i]) for i in order_o) for r in o_rows)
    s_only = [r for r in s_set if r not in set(o_set)][:limit]
    o_only = [r for r in o_set if r not in set(s_set)][:limit]
    print(f"      cols: {sorted(s_cols)}")
    for r in s_only:
        print(f"      spark-only: {r}")
    for r in o_only:
        print(f"      oracle-only: {r}")


if __name__ == "__main__":
    sys.exit(main())
