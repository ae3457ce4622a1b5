"""Deterministic N-x replica of a testdata SF directory, for headroom
and plan evidence past the largest driver-provided scale.

The driver provides sf0.001/0.01/0.1; the int64-headroom and
broadcast-decision claims in the financial/dedup docstrings are analysis
until exercised at a bigger scale. This tool writes an sf1-scale replica
(default factor 10 over sf0.1) into scratch space by key-offset
replication:

- fact/entity keys (orderkey, custkey, partkey, suppkey, doc_id, vec_id,
  event_id) shift by ``replica * (max_key + 1)`` so every FK pair stays
  consistent within its replica and cardinalities scale exactly N-x;
- the fixed dimensions (nation, region) copy through unchanged, like
  real TPC-H scaling;
- events keep their user_ids but shift ts by ``replica * 400 days`` —
  per-user histories get N-x longer in events AND time span, which is
  the axis the TWAP/OHLC/session accumulator-headroom claims live on;
- documents keep their texts (exact duplicates across replicas — a
  deliberately duplicate-heavy corpus for the dedup family) and
  embeddings keep their vectors (duplicate distances exercise the ANN
  tie-breaking contracts).

This is VOLUME scaling for evidence runs, not dbgen distribution
parity: value distributions repeat N-x rather than re-sampling. Oracle
comparisons remain exact (Spark and DuckDB read the same files).

Usage:
    python tools/make_scaled_sf.py [--factor 10] \
        [--src /root/testdata/sf0.1] [--dst /tmp/fdes_scaled/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

#: table -> columns offset by replica * (max+1) of the named source key.
#: Each entry: (column, key_source_table, key_source_column) — FK columns
#: offset by the PARENT table's max so both sides shift identically.
OFFSETS: dict[str, list[tuple[str, str, str]]] = {
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
    "events": [("event_id", "events", "event_id")],
    "nation": [],
    "region": [],
}

#: tables copied through unchanged (fixed dimensions).
FIXED = {"nation", "region"}


def scale(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    maxima: dict[tuple[str, str], int] = {}
    for specs in OFFSETS.values():
        for _, kt, kc in specs:
            if (kt, kc) not in maxima:
                maxima[(kt, kc)] = con.sql(
                    f"SELECT max({kc}) + 1 FROM '{src}/{kt}.parquet'"
                ).fetchone()[0]
    for table, specs in OFFSETS.items():
        src_path = f"{src}/{table}.parquet"
        dst_path = f"{dst}/{table}.parquet"
        if not os.path.exists(src_path):
            continue
        if table in FIXED:
            con.execute(
                f"COPY (SELECT * FROM '{src_path}') TO '{dst_path}'"
                " (FORMAT PARQUET, COMPRESSION SNAPPY)"
            )
            continue
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src_path}'"
            ).fetchall()
        ]
        off = {c: maxima[(kt, kc)] for c, kt, kc in specs}
        exprs = []
        for c in cols:
            if c in off:
                exprs.append(f"{c} + r.n * {off[c]} AS {c}")
            elif table == "events" and c == "ts":
                exprs.append(
                    f"{c} + to_days((r.n * 400)::INT) AS {c}"
                )
            else:
                exprs.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM '{src_path}', "
            f"(SELECT unnest(range({factor})) AS n) r) "
            f"TO '{dst_path}' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst_path}'").fetchone()[0]
        print(f"{table}: {n} rows -> {dst_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/fdes_scaled/sf1")
    args = ap.parse_args()
    scale(args.src, args.dst, args.factor)


if __name__ == "__main__":
    main()
