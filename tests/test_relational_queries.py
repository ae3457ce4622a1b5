"""Smoke + semantics tests for the relational query batch.

Oracle-level value equality is covered by tools/check_correctness.py and the
driver's sf0.01 gate; these tests pin down operator semantics (determinism,
tie-breaks, anti-join emptiness) at sf0.001 so regressions localize.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_engineering_spark import queries as q
from financial_data_engineering_spark.operators import (
    argmax_per_group,
    duplicate_row_count,
    union_frames,
)
from tests.conftest import SF_SMALL


def test_flagship_runs_and_is_deterministic(spark):
    fn = q.all_queries()["nation_latest_order_revenue"]
    a = fn(spark, SF_SMALL).collect()
    b = fn(spark, SF_SMALL).collect()
    assert a == b
    assert 0 < len(a) <= 10
    assert a[0]["latest_revenue_e2"] >= a[-1]["latest_revenue_e2"]


def test_every_query_has_matching_column_names_with_oracle(spark):
    # oracle strings must alias the same column names the Spark frame emits
    oracles = q.all_oracles()
    for name, fn in q.all_queries().items():
        df = fn(spark, SF_SMALL)
        assert len(df.columns) == len(set(df.columns)), f"{name}: dup col names"
        if name in oracles:
            sql = oracles[name].lower()
            for col in df.columns:
                assert col.lower() in sql, f"{name}: column {col} absent from oracle"


def test_argmax_per_group_breaks_ties_deterministically(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b"), (2, 5, "c")], "k int, v int, payload string"
    )
    out = argmax_per_group(df, ["k"], "v", tiebreak_cols=["payload"]).collect()
    got = {r["k"]: r["payload"] for r in out}
    assert got == {1: "b", 2: "c"}


def test_duplicate_row_count_keep_false_semantics(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,), (None,)], "k int"
    )
    row = duplicate_row_count(df, ["k"]).collect()[0]
    # pandas duplicated(keep=False): 1 appears 3x and NULL 2x -> 5 dup rows
    assert row["duplicate_rows"] == 5
    assert row["unique_rows"] == 2
    assert row["total_rows"] == 7


def test_union_frames_aligns_by_name(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([("y", 2)], "name string, id int")
    out = union_frames([a, b]).orderBy("id").collect()
    assert [(r["id"], r["name"]) for r in out] == [(1, "x"), (2, "y")]


def test_customers_without_orders_empty_on_testdata(spark):
    fn = q.all_queries()["customers_without_orders"]
    assert fn(spark, SF_SMALL).count() == 0


def test_pricing_summary_groups(spark):
    fn = q.all_queries()["pricing_summary"]
    rows = fn(spark, SF_SMALL).collect()
    flags = {(r["l_returnflag"], r["l_linestatus"]) for r in rows}
    assert len(flags) == len(rows)
    assert all(r["count_order"] > 0 for r in rows)


def test_kmv_distinct_exact_when_k_covers_cardinality(spark):
    """Fewer distinct keys than k: the sketch holds every hash, so the
    estimate IS the exact count; duplicates and NULLs don't inflate it."""
    from financial_data_engineering_spark.operators import kmv_distinct

    df = spark.createDataFrame(
        [(i % 40,) for i in range(400)] + [(None,)], "k int"
    )
    row = kmv_distinct(df, "k", k=256).collect()[0]
    assert row.n_exact == 40
    assert row.kmv_estimate == 40
    assert row.err_e4 == 0


def test_kmv_distinct_estimates_within_expected_error(spark):
    """More distinct keys than k: estimate within ~5/sqrt(k-1) relative
    error (far looser than the 1-sigma bound, so not flaky) and consistent
    with the reported err_e4."""
    from financial_data_engineering_spark.operators import kmv_distinct

    df = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    row = kmv_distinct(df, "k", k=256).collect()[0]
    assert row.n_exact == 5000
    assert abs(row.kmv_estimate - 5000) / 5000 < 5 / (255**0.5)
    assert row.err_e4 == (
        2 * abs(row.kmv_estimate - 5000) * 10000 + 5000
    ) // (2 * 5000)


class TestPointInIntervalJoin:
    """Bucketed range-join operator: containment semantics and plan shape."""

    def _frames(self, spark):
        points = spark.createDataFrame(
            [(0, 5), (1, 10), (2, 14), (3, 15), (4, 99)],
            "pid long, p long",
        )
        intervals = spark.createDataFrame(
            [(100, 5, 15), (200, 10, 11), (300, 90, 120)],
            "iid long, s long, e long",
        )
        return points, intervals

    def test_containment_inclusive_start_exclusive_end(self, spark):
        from financial_data_engineering_spark.operators.rangejoin import (
            point_in_interval_join,
        )

        points, intervals = self._frames(spark)
        got = sorted(
            (r.pid, r.iid)
            for r in point_in_interval_join(
                points, intervals, "p", "s", "e", bucket_width=7
            ).collect()
        )
        # p=5 in [5,15); p=10 in [5,15) and [10,11); p=14 in [5,15);
        # p=15 NOT in [5,15) (end exclusive); p=99 in [90,120)
        assert got == [(0, 100), (1, 100), (1, 200), (2, 100), (4, 300)]

    def test_bucket_width_does_not_change_semantics(self, spark):
        from financial_data_engineering_spark.operators.rangejoin import (
            point_in_interval_join,
        )

        points, intervals = self._frames(spark)
        expect = None
        for width in (1, 3, 50, 1000):
            got = sorted(
                (r.pid, r.iid)
                for r in point_in_interval_join(
                    points, intervals, "p", "s", "e", bucket_width=width
                ).collect()
            )
            expect = got if expect is None else expect
            assert got == expect, f"width={width} changed the result"

    def test_extra_equality_keys(self, spark):
        from financial_data_engineering_spark.operators.rangejoin import (
            point_in_interval_join,
        )

        points = spark.createDataFrame(
            [("a", 5), ("b", 5)], "k string, p long"
        )
        intervals = spark.createDataFrame(
            [("a", 0, 10)], "k string, s long, e long"
        )
        got = point_in_interval_join(
            points, intervals, "p", "s", "e", bucket_width=4, keys=["k"]
        ).collect()
        assert [(r.k, r.p) for r in got] == [("a", 5)]

    def test_no_nested_loop_join_in_plan(self, spark):
        from financial_data_engineering_spark import plans
        from financial_data_engineering_spark.operators.rangejoin import (
            point_in_interval_join,
        )

        points, intervals = self._frames(spark)
        df = point_in_interval_join(
            points, intervals, "p", "s", "e", bucket_width=7
        )
        assert plans.nested_loop_join_count(df) == 0
        assert plans.cartesian_count(df) == 0


class TestIntervalOverlapJoin:
    """Bucketed interval-overlap join: half-open overlap semantics and the
    first-shared-bucket dedup (each pair exactly once, no distinct)."""

    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 0, 10), (2, 20, 30), (3, 5, 50)],
            "lid long, ls long, le long",
        )
        right = spark.createDataFrame(
            [(10, 9, 12), (20, 10, 15), (30, 29, 31), (40, 60, 70)],
            "rid long, rs long, re long",
        )
        return left, right

    def test_overlap_semantics_half_open(self, spark):
        from financial_data_engineering_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        left, right = self._frames(spark)
        got = sorted(
            (r.lid, r.rid)
            for r in interval_overlap_join(
                left, right, "ls", "le", "rs", "re", bucket_width=8
            ).collect()
        )
        # [0,10) overlaps [9,12) but NOT [10,15) (half-open); [20,30)
        # overlaps [29,31); [5,50) overlaps [9,12), [10,15), [29,31);
        # nothing overlaps [60,70)
        assert got == [(1, 10), (2, 30), (3, 10), (3, 20), (3, 30)]

    def test_each_pair_exactly_once_across_widths(self, spark):
        """A pair spanning many shared buckets must not duplicate."""
        from financial_data_engineering_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        left, right = self._frames(spark)
        expect = None
        for width in (1, 3, 8, 100):
            got = sorted(
                (r.lid, r.rid)
                for r in interval_overlap_join(
                    left, right, "ls", "le", "rs", "re", bucket_width=width
                ).collect()
            )
            expect = got if expect is None else expect
            assert got == expect, f"width={width} changed the result"
