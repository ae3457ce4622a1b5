"""Financial operator tests: the EWMA band fold against a pure-Python
simultaneous-update reference (the same pinning strategy as test_bpe —
the recurrence has no closed form to oracle), and OHLC bar correctness
including negative prices and argmin/argmax determinism."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators.finance import (
    BAND_K,
    EWMA_ALPHA_DEN,
    EWMA_ALPHA_NUM,
    ewma_band_fold,
    ohlc_bars,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_ewma_band(xs: list[int]) -> tuple[int, int, int, int, int]:
    """Simultaneous-update reference: breach counters read the OLD
    (ewma, dev), then both recurrences advance from the OLD state."""
    rest = EWMA_ALPHA_DEN - EWMA_ALPHA_NUM
    half = EWMA_ALPHA_DEN // 2
    ewma, dev, n, na, nb = xs[0], 0, 1, 0, 0
    for x in xs[1:]:
        na += 1 if x > ewma + BAND_K * dev else 0
        nb += 1 if x < ewma - BAND_K * dev else 0
        new_ewma = (EWMA_ALPHA_NUM * x + rest * ewma + half) // EWMA_ALPHA_DEN
        new_dev = (abs(x - ewma) + rest * dev + half) // EWMA_ALPHA_DEN
        ewma, dev, n = new_ewma, new_dev, n + 1
    return ewma, dev, n, na, nb


@_SETTINGS
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=10_000_000),
        min_size=1,
        max_size=60,
    )
)
def test_ewma_band_fold_matches_python_reference(spark, xs):
    df = spark.createDataFrame([(xs,)], "px array<long>")
    st_col = ewma_band_fold(F.col("px"))
    row = df.select(
        st_col["ewma"].alias("ewma"),
        st_col["dev"].alias("dev"),
        st_col["n"].alias("n"),
        st_col["n_above"].alias("na"),
        st_col["n_below"].alias("nb"),
    ).collect()[0]
    want = _py_ewma_band(xs)
    assert (row.ewma, row.dev, row.n, row.na, row.nb) == want


def test_ewma_band_single_tick_is_lifted_state(spark):
    row = (
        spark.createDataFrame([([42],)], "px array<long>")
        .select(ewma_band_fold(F.col("px")).alias("st"))
        .collect()[0]["st"]
    )
    assert row.asDict() == {
        "n_above": 0, "n_below": 0, "dev": 0, "ewma": 42, "n": 1
    }


def test_ewma_fold_init_resumes_exactly(spark):
    """Folding [a,b,c,d] equals folding [c,d] with init = fold([a,b]) —
    the left-fold composition segmented replay relies on."""
    xs = [100, 250, 90, 410, 330, 75, 500]
    for cut in range(1, len(xs)):
        head, tail = xs[:cut], xs[cut:]
        df = spark.createDataFrame(
            [(xs, head, tail)],
            "full array<long>, head array<long>, tail array<long>",
        )
        row = df.select(
            ewma_band_fold(F.col("full")).alias("whole"),
            ewma_band_fold(
                F.col("tail"), init=ewma_band_fold(F.col("head"))
            ).alias("resumed"),
        ).collect()[0]
        assert row.whole == row.resumed, f"cut={cut}"


def test_ewma_segmented_replay_bit_identical(spark):
    """_ewma_select with a tiny segment bound (forcing multi-segment
    replay, including keys that end mid-segment and keys shorter than
    one segment) matches the single-fold path exactly."""
    from financial_data_engineering_spark.queries.finance import _ewma_select

    rows = []
    for k, n in [("a", 23), ("b", 7), ("c", 1), ("d", 40)]:
        for i in range(n):
            # deterministic pseudo-random walk, some ties in us
            rows.append((k, (i * 7919) % 11, i, (i * 104729) % 9973))
    df = spark.createDataFrame(
        rows, "key string, us long, eid long, px long"
    ).select(
        "key",
        F.struct(F.col("us"), F.col("eid")).alias("o"),
        F.col("px"),
    )
    direct = _ewma_select(df, "key", "n_events").collect()
    segmented = _ewma_select(df, "key", "n_events", seg_n=5).collect()
    assert direct == segmented
    assert {r.key: r.n_events for r in direct} == {
        "a": 23, "b": 7, "c": 1, "d": 40
    }


def test_ohlc_bars_deterministic_with_negative_prices(spark):
    """open/close follow the order key, not the price sign; high/low
    are plain extremes; count/volume exact."""
    rows = [
        # (key, ord, px, size) — ord strings sort c1 < c2 < c3
        ("k", "c2", -50, 2),
        ("k", "c3", 10, 1),
        ("k", "c1", 7, 4),
    ]
    df = spark.createDataFrame(rows, "k string, o string, px long, qty long")
    got = ohlc_bars(df, ["k"], "o", "px", size_col="qty").collect()[0]
    assert got.open_e2 == 7  # first by order key
    assert got.close_e2 == 10  # last by order key
    assert got.high_e2 == 10 and got.low_e2 == -50
    assert got.n_trades == 3 and got.volume == 7


def test_ohlc_bars_extra_aggs_ride_same_aggregate(spark):
    from financial_data_engineering_spark import plans

    df = spark.createDataFrame(
        [("k", "a", 1, 1), ("k", "b", 5, 2)],
        "k string, o string, px long, qty long",
    )
    out = ohlc_bars(
        df, ["k"], "o", "px",
        extra_aggs=[F.sum("px").alias("sum_px")],
    )
    assert out.collect()[0].sum_px == 6
    assert plans.shuffle_count(out) <= 1
