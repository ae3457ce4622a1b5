"""Unit + property tests for the round-5 analytics operators:
scalable_ntile (must equal the engine's single-partition NTILE exactly,
including remainder buckets), locf_daily_fill (must equal the naive
spine-join LOCF), and blocked_name_match_stats (counts + the block-size
guard)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.operators import (
    blocked_name_match_stats,
    locf_daily_fill,
    scalable_ntile,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=40),
    k=st.integers(1, 12),
)
def test_scalable_ntile_equals_window_ntile(spark, vals, k):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    )
    got = {
        r.id: r.bucket
        for r in scalable_ntile(df, ["v", "id"], k, num_partitions=3).collect()
    }
    want = {
        r.id: r.nt
        for r in df.withColumn(
            "nt", F.ntile(k).over(Window.orderBy("v", "id")).cast("long")
        ).collect()
    }
    assert got == want


def test_scalable_ntile_rejects_bad_k(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        scalable_ntile(df, ["v"], 0)


@_SETTINGS
@given(
    series=st.dictionaries(
        st.integers(0, 3),  # entity
        st.dictionaries(
            st.integers(0, 20), st.integers(-9, 9), min_size=1, max_size=8
        ),  # day offset -> value
        min_size=1,
        max_size=4,
    )
)
def test_locf_fill_matches_naive(spark, series):
    base = dt.date(2024, 3, 1)
    rows = [
        (e, base + dt.timedelta(days=d), v)
        for e, obs in series.items()
        for d, v in obs.items()
    ]
    df = spark.createDataFrame(rows, "e long, day date, v long")
    got = sorted(
        (r.e, r.day, r.v, r.is_gap)
        for r in locf_daily_fill(df, "e", "day", ["v"]).collect()
    )
    want = []
    for e, obs in series.items():
        days = sorted(obs)
        for d in range(days[0], days[-1] + 1):
            last = max(o for o in days if o <= d)
            want.append(
                (e, base + dt.timedelta(days=d), obs[last], int(d not in obs))
            )
    assert got == sorted(want)


def test_blocked_name_match_counts(spark):
    # block "x": names a(2 records), ab(1), zzzz(1) — a~ab close (d=1),
    # zzzz far; block "y": single name, no pairs.
    rows = [
        ("x", "a"),
        ("x", "a"),
        ("x", "ab"),
        ("x", "zzzz"),
        ("y", "solo"),
    ]
    df = spark.createDataFrame(rows, "blk string, name string")
    got = {
        r.blk: (
            r.n_records,
            r.n_names,
            r.n_exact_pairs,
            r.n_close_names,
            r.n_close_pairs,
        )
        for r in blocked_name_match_stats(df, "blk", "name", max_dist=2).collect()
    }
    assert got == {
        "x": (4, 3, 1, 1, 2),  # exact: a-a; close names: (a, ab); 2*1 records
        "y": (1, 1, 0, 0, 0),
    }


def test_blocked_name_match_guard_refuses_fat_block(spark):
    rows = [("b", f"name{i}") for i in range(5)]
    df = spark.createDataFrame(rows, "blk string, name string")
    with pytest.raises(ValueError, match="max_block_names"):
        blocked_name_match_stats(df, "blk", "name", max_block_names=3)


@_SETTINGS
@given(
    items=st.lists(st.integers(0, 15), min_size=1, max_size=60),
    k=st.integers(1, 8),
)
def test_misra_gries_bounds(spark, items, k):
    from collections import Counter

    from financial_data_engineering_spark.operators import misra_gries_topk

    df = spark.createDataFrame([(i,) for i in items], "item long").repartition(3)
    # default (no top=) returns the FULL merged summary — the form the
    # presence guarantee below is stated for
    got = misra_gries_topk(df, "item", k).collect()
    true = Counter(str(i) for i in items)
    n = len(items)
    if not got:
        # An empty summary is legitimate: the subtraction step can wipe
        # every counter (e.g. [0, 1] with k=1 — all counts tie at the
        # (k+1)-th largest). The error mass is then unobservable, but the
        # a-priori bound err <= sum(n_p) / (k+1) still guarantees no item
        # exceeded it: max true count <= per-partition mass bound.
        assert max(true.values()) <= n // (k + 1) + 3  # 3 partitions
        return
    errs = {r.err_bound for r in got}
    assert len(errs) == 1  # one global error mass
    err = errs.pop()
    # summed per-partition error never exceeds the global MG bound
    assert err <= n  # trivially, and per-partition <= n_p/(k+1) sums to:
    assert err <= 3 * (n // (k + 1) + 1)
    for r in got:
        assert r.est_count <= true[r.item] <= r.est_count + err
    present = {r.item for r in got}
    for item, cnt in true.items():
        if cnt > err:
            assert item in present


@_SETTINGS
@given(
    hot_n=st.integers(5, 12),
    cold_n=st.integers(0, 3),
    bound=st.integers(1, 4),
)
def test_pattern_run_counts_guard_refuses_hot_entity(
    spark, hot_n, cold_n, bound
):
    """A degenerate hot entity past max_seq_len must raise at the guard
    aggregate, never reach the collect_list; entities under the bound
    pass through untouched."""
    from financial_data_engineering_spark.operators import pattern_run_counts

    rows = [("hot", i, float(i), "browse") for i in range(hot_n)]
    rows += [("cold", 100 + i, 100.0 + i, "buy") for i in range(cold_n)]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts double, event_type string"
    )
    assert hot_n > bound
    with pytest.raises(ValueError, match="max_seq_len"):
        pattern_run_counts(df, "b+", max_seq_len=bound)
    # the same frame under a sufficient bound still computes
    out = {
        r.user_id: r.n_runs
        for r in pattern_run_counts(df, "b+", max_seq_len=hot_n).collect()
    }
    assert out["hot"] == 1  # one maximal run of consecutive b's
    # max_seq_len=None skips the eager guard entirely: the call stays
    # lazily composable (no job at plan time) and the would-be-refused
    # hot entity computes normally
    lazy = pattern_run_counts(df, "b+", max_seq_len=None)
    assert {r.user_id: r.n_runs for r in lazy.collect()} == out


@_SETTINGS
@given(
    items=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=80,
    ),
    width=st.sampled_from([2, 4, 16]),
    depth=st.integers(1, 3),
)
def test_count_min_never_undercounts(spark, items, width, depth):
    """Count-Min guarantee: every estimate >= the true count (the
    complement of Misra-Gries' never-overcount)."""
    from collections import Counter

    from financial_data_engineering_spark.operators import (
        count_min_build,
        count_min_estimate,
    )

    df = spark.createDataFrame([(x,) for x in items], "item string")
    cm = count_min_build(df, "item", width=width, depth=depth)
    probe = spark.createDataFrame(
        [(x,) for x in sorted(set(items))], "item string"
    )
    got = {
        r["item"]: r["cm_estimate"]
        for r in count_min_estimate(
            probe, cm, "item", width=width, depth=depth
        ).collect()
    }
    true = Counter(items)
    for item, cnt in true.items():
        assert got[item] >= cnt, (item, got[item], cnt)
        assert got[item] <= len(items)  # bounded by stream volume


def test_count_min_merge_equals_single_build(spark):
    from financial_data_engineering_spark.operators import (
        count_min_build,
        count_min_merge,
    )

    a = spark.createDataFrame([(f"a{i % 7}",) for i in range(60)], "item string")
    b = spark.createDataFrame([(f"b{i % 5}",) for i in range(40)], "item string")
    merged = count_min_merge(
        count_min_build(a, "item", width=8),
        count_min_build(b, "item", width=8),
    )
    single = count_min_build(a.unionByName(b), "item", width=8)
    as_map = lambda df: {(r.row, r.col): r.cnt for r in df.collect()}  # noqa: E731
    assert as_map(merged) == as_map(single)


def test_count_min_validates_inputs(spark):
    from financial_data_engineering_spark.operators import (
        count_min_build,
        count_min_merge,
    )

    df = spark.createDataFrame([("x",)], "item string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="width"):
        count_min_build(df, "item", width=0)
    with _pytest.raises(ValueError, match="depth"):
        count_min_build(df, "item", depth=0)
    with _pytest.raises(ValueError, match="at least one"):
        count_min_merge()
