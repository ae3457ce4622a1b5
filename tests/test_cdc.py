"""Changelog application (operators/cdc.py): MERGE semantics the oracle
gate exercises only through one derived changelog — these pin the
operator's contract corners directly."""

from __future__ import annotations

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
