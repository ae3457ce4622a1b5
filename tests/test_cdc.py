"""Changelog application (operators/cdc.py): MERGE semantics the oracle
gate exercises only through one derived changelog — these pin the
operator's contract corners directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_engineering_spark.operators.cdc import apply_changelog


def _merge(spark, snapshot_rows, change_rows):
    snap = spark.createDataFrame(snapshot_rows, "k long, v long")
    chg = spark.createDataFrame(change_rows, "k long, seq long, op string, v long")
    out = apply_changelog(snap, chg, "k", ["seq"], payload=["v"])
    return {r["k"]: (r["status"], r["v"]) for r in out.collect()}


def test_last_writer_wins_update(spark):
    got = _merge(
        spark,
        [(1, 10)],
        [(1, 1, "U", 20), (1, 2, "U", 30)],
    )
    assert got == {1: ("updated", 30)}


def test_delete_then_update_resurrects(spark):
    got = _merge(
        spark,
        [(1, 10)],
        [(1, 1, "D", None), (1, 2, "U", 99)],
    )
    assert got == {1: ("updated", 99)}


def test_update_then_delete_removes(spark):
    got = _merge(
        spark,
        [(1, 10), (2, 20)],
        [(1, 1, "U", 99), (1, 2, "D", None)],
    )
    assert got == {2: ("kept", 20)}


def test_delete_missing_key_is_idempotent(spark):
    got = _merge(spark, [(1, 10)], [(7, 1, "D", None)])
    assert got == {1: ("kept", 10)}


def test_update_of_missing_key_inserts(spark):
    got = _merge(spark, [(1, 10)], [(7, 1, "U", 70), (8, 1, "I", 80)])
    assert got == {1: ("kept", 10), 7: ("inserted", 70), 8: ("inserted", 80)}


def test_untouched_keys_pass_through(spark):
    got = _merge(
        spark,
        [(1, 10), (2, 20), (3, 30)],
        [(2, 1, "U", 21)],
    )
    assert got == {1: ("kept", 10), 2: ("updated", 21), 3: ("kept", 30)}


def test_merge_plan_windows_only_the_changelog(spark):
    """The snapshot side must not be windowed: exactly one window node,
    and it sits over the changelog scan."""
    snap = spark.createDataFrame([(1, 10)], "k long, v long")
    chg = spark.createDataFrame([(1, 1, "U", 2)], "k long, seq long, op string, v long")
    plan = (
        apply_changelog(snap, chg, "k", ["seq"], payload=["v"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # exactly one Window node (WindowGroupLimit is the rank-limit
    # pushdown over the same frame, not a second window)
    assert plan.count("Window [") == 1
    assert "WindowGroupLimit" in plan


def test_scd2_intervals_versions_and_validity(spark):
    """Versions number 1..n per key in order; valid_to chains to the
    next version's valid_from (half-open, no gaps/overlaps); only the
    last version is current; payload rides each version unchanged."""
    from financial_data_engineering_spark.operators.cdc import (
        scd2_intervals,
    )

    chg = spark.createDataFrame(
        [
            (1, 10, "2020-01-01", 100),
            (1, 20, "2020-03-01", 101),
            (1, 15, "2020-02-01", 102),
            (2, 99, "2020-06-01", 103),
        ],
        "k long, val long, ts string, seq long",
    ).select("k", "val", F.to_timestamp("ts").alias("ts"), "seq")
    rows = sorted(
        scd2_intervals(chg, "k", ["ts", "seq"], payload=["val"]).collect(),
        key=lambda r: (r["k"], r["version"]),
    )
    k1 = [r for r in rows if r["k"] == 1]
    assert [r["version"] for r in k1] == [1, 2, 3]
    assert [r["val"] for r in k1] == [10, 15, 20]  # ts order, not input
    # half-open chain: each valid_to is the next valid_from
    assert k1[0]["valid_to"] == k1[1]["valid_from"]
    assert k1[1]["valid_to"] == k1[2]["valid_from"]
    assert k1[2]["valid_to"] is None
    assert [r["is_current"] for r in k1] == [False, False, True]
    (k2,) = [r for r in rows if r["k"] == 2]
    assert (k2["version"], k2["is_current"]) == (1, True)
