"""HyperLogLog: the pinned integer contract vs a pure-Python replay,
plus the two hazards the oracle gate can't isolate — the 255-value
linear-counting ln domain (exhaustive cross-engine check) and the
merge-equals-global-sketch property."""

from __future__ import annotations

import hashlib
import math

import duckdb
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators.hll import (
    HLL_ALPHA_DEN,
    HLL_ALPHA_NUM,
    HLL_LC_THRESHOLD,
    HLL_M,
    HLL_RMAX,
    HLL_W_MOD,
    hll_distinct,
    hll_group_union,
    hll_registers,
)

_M2_RMAX = HLL_M * HLL_M * (1 << HLL_RMAX)


def _py_hll(values) -> int:
    """Reference replay of the exact register/estimator contract."""
    regs = {}
    for v in {str(v) for v in values}:
        h = int(hashlib.md5(v.encode()).hexdigest()[:12], 16)
        bucket, w = h // HLL_W_MOD, h % HLL_W_MOD
        rho = HLL_RMAX if w == 0 else HLL_RMAX - len(format(w, "b"))
        regs[bucket] = max(regs.get(bucket, 0), rho)
    s = sum(1 << (HLL_RMAX - r) for r in regs.values())
    s += (HLL_M - len(regs)) * (1 << HLL_RMAX)
    raw = (HLL_ALPHA_NUM * (_M2_RMAX // s)) // HLL_ALPHA_DEN
    v_zero = HLL_M - len(regs)
    if raw <= HLL_LC_THRESHOLD and v_zero > 0:
        return math.floor(round(HLL_M * math.log(HLL_M / v_zero), 9))
    return raw


def test_lc_ln_table_agrees_across_engines_exhaustively(spark):
    """The ONE float term in the contract has domain V ∈ 1..m−1; verify
    Spark, DuckDB, and Python agree on every value, not by argument."""
    got = {
        r["v"]: r["lc"]
        for r in spark.range(1, HLL_M)
        .select(
            F.col("id").alias("v"),
            F.expr(
                f"CAST(floor(round({HLL_M} * ln(CAST({HLL_M} AS DOUBLE)"
                " / id), 9)) AS BIGINT)"
            ).alias("lc"),
        )
        .collect()
    }
    con = duckdb.connect()
    for v in range(1, HLL_M):
        duck = con.execute(
            f"SELECT CAST(floor(round({HLL_M} * ln(CAST({HLL_M} AS DOUBLE)"
            f" / {v}), 9)) AS BIGINT)"
        ).fetchone()[0]
        py = math.floor(round(HLL_M * math.log(HLL_M / v), 9))
        assert got[v] == duck == py, v


def _estimate(spark, values) -> tuple[int, int]:
    df = spark.createDataFrame([(v,) for v in values], "k long")
    row = hll_distinct(df, "k").collect()[0]
    return row["hll_estimate"], row["n_exact"]


def test_matches_python_reference_small_and_large(spark):
    for n in (10, 300, 5000):
        values = list(range(n))
        est, exact = _estimate(spark, values)
        assert est == _py_hll(values)
        assert exact == n


def test_duplicates_and_nulls_do_not_move_the_estimate(spark):
    df = spark.createDataFrame(
        [(v % 50,) for v in range(500)] + [(None,)] * 5, "k long"
    )
    row = hll_distinct(df, "k").collect()[0]
    assert row["n_exact"] == 50
    assert row["hll_estimate"] == _py_hll(range(50))


def test_small_range_linear_counting_is_tight(spark):
    """LC at n << m should land within a few percent, where the raw
    estimator would answer ~alpha·m regardless of n."""
    est, exact = _estimate(spark, range(40))
    assert abs(est - exact) <= max(3, exact // 10)


def test_raw_regime_within_advertised_error(spark):
    """1.04/sqrt(m) ≈ 6.5% standard error; allow 3 sigma."""
    est, exact = _estimate(spark, range(20_000))
    assert abs(est - exact) / exact < 0.20


def test_merged_registers_equal_global_sketch(spark):
    """Element-wise max of per-group registers == the single global
    register table — the reduce-tree mergeability property."""
    df = spark.createDataFrame(
        [(v % 7, v * 31) for v in range(2000)], "grp long, k long"
    )
    merged = {
        (r["bucket"], r["reg"])
        for r in hll_registers(df, "k", "grp")
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
        .collect()
    }
    direct = {
        (r["bucket"], r["reg"])
        for r in hll_registers(df, "k").collect()
    }
    assert merged == direct


def test_group_union_all_row_matches_global_estimate(spark):
    df = spark.createDataFrame(
        [(str(v % 3), v % 800) for v in range(5000)], "grp string, k long"
    )
    rows = {
        r["grp"]: r for r in hll_group_union(df, "grp", "k").collect()
    }
    est, _ = _estimate(spark, range(800))
    assert rows["__ALL__"]["hll_estimate"] == est
    assert rows["__ALL__"]["n_exact"] == 800


def test_group_union_rejects_sentinel_collision(spark):
    """A real group equal to the all_label sentinel must raise, not
    silently collide with the merged row (r9 ADVICE)."""
    import pytest
    from pyspark.errors import PySparkException

    df = spark.createDataFrame(
        [("__ALL__", 1), ("a", 2)], "grp string, k long"
    )
    with pytest.raises(PySparkException, match="all_label sentinel"):
        hll_group_union(df, "grp", "k").collect()
