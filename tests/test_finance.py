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


# ---------------------------------------------------------------------------
# Property tests for the month-segmented plans: random synthetic ticks vs a
# pure-Python reference of the GLOBAL (unsegmented) definition — stressing
# shapes the fixed datasets can't: runs spanning several months, months with
# fewer than ROLL_N ticks, fully-underwater months, single-tick months.
# ---------------------------------------------------------------------------

import datetime

from financial_data_engineering_spark.queries.finance import (
    ROLL_MIN,
    ROLL_N,
    _return_stats_segmented,
    _rolling_band_segmented,
    _underwater_runs_segmented,
)

_ticks = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # month index
        st.integers(min_value=0, max_value=999),  # within-month us offset
        st.integers(min_value=1, max_value=40),   # px
    ),
    min_size=1,
    max_size=60,
)


def _mk_seq(spark, ticks):
    """(key, bar_m, o(us, okey, lineno, tb), px) frame from (month,
    offset, px) tuples; us embeds the month so event-time order equals
    (month, offset, insertion) order."""
    rows = []
    for i, (m, off, px) in enumerate(ticks):
        us = m * 1_000_000_000 + off * 1000 + i  # unique, month-major
        bar_m = datetime.date(2020, 1 + m, 1)
        rows.append(("k", bar_m, us, i, 0, px, px))
    df = spark.createDataFrame(
        rows,
        "key string, bar_m date, us long, okey long, lineno long,"
        " tb long, px long",
    )
    return df.select(
        "key",
        "bar_m",
        F.struct("us", "okey", "lineno", "tb").alias("o"),
        "px",
    )


def _ordered(ticks):
    return sorted(
        (m * 1_000_000_000 + off * 1000 + i, px)
        for i, (m, off, px) in enumerate(ticks)
    )


def _ref_underwater(ticks):
    seq = _ordered(ticks)
    peak = None
    runs, cur_len, cur_start, last_uw_us = [], 0, None, None
    for us, px in seq:
        uw = peak is not None and px < peak
        if uw:
            if cur_len == 0:
                cur_start = us
            cur_len += 1
            last_uw_us = us
        else:
            if cur_len:
                runs.append((cur_len, last_uw_us - cur_start))
            cur_len = 0
        peak = px if peak is None else max(peak, px)
    if cur_len:
        runs.append((cur_len, last_uw_us - cur_start))
    if not runs:
        return None
    return (
        len(runs),
        max(r[0] for r in runs),
        max(r[1] for r in runs),
    )


def _ref_rolling_band(ticks):
    seq = [px for _, px in _ordered(ticks)]
    n_eval = n_above = n_below = 0
    for i, px in enumerate(seq):
        wnd = seq[max(0, i - ROLL_N) : i]
        n = len(wnd)
        if n < ROLL_MIN:
            continue
        n_eval += 1
        s, ss = sum(wnd), sum(v * v for v in wnd)
        diff = n * px - s
        if diff * diff > BAND_K * BAND_K * (n * ss - s * s):
            if diff > 0:
                n_above += 1
            elif diff < 0:
                n_below += 1
    return (len(seq), n_eval, n_above, n_below)


@_SETTINGS
@given(ticks=_ticks)
def test_underwater_segmented_matches_reference(spark, ticks):
    got = _underwater_runs_segmented(_mk_seq(spark, ticks), "key").collect()
    want = _ref_underwater(ticks)
    if want is None:
        assert got == []
    else:
        assert len(got) == 1
        r = got[0]
        assert (r.n_runs, r.max_run_ticks, r.max_run_dur_us) == want


def _div_trunc(a, b):
    """Spark SQL `div`: integer division truncating toward zero."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _ref_return_stats(ticks):
    """Global (unsegmented) return stats: one lag over the whole ordered
    history — the oracle's definition."""
    seq = [px for _, px in _ordered(ticks)]
    rs = [
        _div_trunc(2 * (px - prev) * 10000 + prev, 2 * prev)
        for prev, px in zip(seq, seq[1:])
    ]
    if not rs:
        return None
    n = len(rs)
    return (
        n,
        min(rs),
        max(rs),
        _div_trunc(2 * sum(rs) + n, 2 * n),
        sum(1 for r in rs if r > 0),
        sum(1 for r in rs if r < 0),
    )


@_SETTINGS
@given(ticks=_ticks)
def test_return_stats_segmented_matches_reference(spark, ticks):
    """Month-boundary stitching + the degenerate shapes the round-8
    ADVICE flagged: every-month-single-tick (all returns are boundary
    returns — sum(sum_r) aggregates only NULLs) and single-tick
    histories (no returns at all — the key must be ABSENT, as in the
    oracle's WHERE r_e4 IS NOT NULL)."""
    got = _return_stats_segmented(_mk_seq(spark, ticks), "key").collect()
    want = _ref_return_stats(ticks)
    if want is None:
        assert got == []
    else:
        assert len(got) == 1
        r = got[0]
        assert (
            r.n_returns, r.min_r_e4, r.max_r_e4,
            r.mean_r_e4, r.n_up, r.n_down,
        ) == want


@_SETTINGS
@given(ticks=_ticks)
def test_rolling_band_segmented_matches_reference(spark, ticks):
    got = _rolling_band_segmented(_mk_seq(spark, ticks), "key").collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_ticks, r.n_eval, r.n_above, r.n_below) == _ref_rolling_band(
        ticks
    )
