"""Property tests for the mergeable quantile sketch: the self-certified
rank-error bound must hold against exact ranks — standalone for the
pure-Python core, end-to-end through mapInPandas + merge for the Spark
operator — and the summary must stay small."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from financial_data_engineering_spark.operators.quantilesketch import (
    _Sketch,
    quantile_sketch,
    sketch_quantiles,
)

_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _rank_bounds_hold(values, sample, err, qs):
    """For each q: the estimate's exact rank window must intersect
    [q*n - err, q*n + err]."""
    values = sorted(values)
    n = len(values)
    for q in qs:
        target = q * n
        est = _estimate(sample, q)
        lo = sum(1 for v in values if v < est)  # min rank of est
        hi = sum(1 for v in values if v <= est)  # max rank of est
        assert lo - err <= target <= hi + err, (
            q,
            est,
            lo,
            hi,
            err,
            n,
        )


def _estimate(sample, q):
    """Inverted CDF over the weighted sample — the same rule
    sketch_quantiles applies relationally."""
    total = sum(w for _, w in sample)
    acc = 0
    for v, w in sorted(sample):
        acc += w
        if acc * 10_000 >= round(q * 10_000) * total:
            return v
    return sample[-1][0]


@_SETTINGS
@given(
    vals=st.lists(
        st.integers(-1000, 1000), min_size=1, max_size=4000
    ),
    k=st.sampled_from([4, 8, 16, 64]),
)
def test_sketch_rank_error_within_self_certified_bound(vals, k):
    sk = _Sketch(k)
    # feed in uneven chunks to exercise mid-stream compactions
    step = max(1, len(vals) // 7)
    for i in range(0, len(vals), step):
        sk.add_many(vals[i : i + step])
    v, w = sk.rows()
    assert sum(w) == len(vals)  # weights exactly partition n
    sample = list(zip(v, w))
    _rank_bounds_hold(
        [float(x) for x in vals], sample, sk.err, [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    )
    # bounded memory: never more than k+1 per level (post-compress), and
    # levels are logarithmic in n/k
    assert all(len(buf) <= sk.k + 1 for buf in sk.levels)
    assert len(sk.levels) <= max(2, (len(vals) // k).bit_length() + 2)


def test_sketch_rejects_bad_k():
    with pytest.raises(ValueError, match="even integer"):
        _Sketch(3)
    with pytest.raises(ValueError, match="even integer"):
        _Sketch(0)


def test_spark_sketch_quantiles_end_to_end(spark):
    """mapInPandas fold + relational merge/query: estimates must respect
    the reported err_bound against exact ranks, across partitions."""
    n = 5000
    df = (
        spark.range(n)
        .repartition(8)
        .selectExpr("CAST(pmod(id * 2654435761, 10007) AS double) AS value")
    )
    vals = sorted(r.value for r in df.collect())
    out = sketch_quantiles(
        quantile_sketch(df, "value", k=64), [0.25, 0.5, 0.9]
    ).collect()
    assert [r.q_e4 for r in out] == [2500, 5000, 9000]
    for r in out:
        assert r.n == n
        target = r.q_e4 * n / 10_000
        lo = sum(1 for v in vals if v < r.est_value)
        hi = sum(1 for v in vals if v <= r.est_value)
        assert lo - r.err_bound <= target <= hi + r.err_bound
        # the bound itself must be non-trivial: well under n
        assert r.err_bound < n / 2


def test_spark_sketch_quantiles_validates_inputs(spark):
    df = spark.range(5).selectExpr("CAST(id AS double) AS value")
    sk = quantile_sketch(df, "value", k=4)
    with pytest.raises(ValueError, match="non-empty"):
        sketch_quantiles(sk, [])
    with pytest.raises(ValueError, match="lie in"):
        sketch_quantiles(sk, [0.0])


def test_grouped_sketch_quantiles_per_key_bounds(spark):
    """Per-key variant: each key's estimates must respect that key's own
    err_bound against the key's exact ranks."""
    from financial_data_engineering_spark.operators.quantilesketch import (
        grouped_quantile_sketch,
        grouped_sketch_quantiles,
    )

    df = spark.range(3000).selectExpr(
        "CAST(id % 3 AS string) AS grp",
        "CAST(pmod(id * 2654435761, 4099) AS double) AS value",
    )
    by_key = {}
    for r in df.collect():
        by_key.setdefault(r.grp, []).append(r.value)
    out = grouped_sketch_quantiles(
        grouped_quantile_sketch(df, "grp", "value", k=32), "grp", [0.5, 0.9]
    ).collect()
    assert {(r.grp, r.q_e4) for r in out} == {
        (g, q) for g in by_key for q in (5000, 9000)
    }
    for r in out:
        vals = sorted(by_key[r.grp])
        assert r.n == len(vals)
        target = r.q_e4 * r.n / 10_000
        lo = sum(1 for v in vals if v < r.est_value)
        hi = sum(1 for v in vals if v <= r.est_value)
        assert lo - r.err_bound <= target <= hi + r.err_bound, (
            r.grp,
            r.q_e4,
        )
        assert r.err_bound < r.n / 2


def test_int_div_half_up_matches_python_exactly(spark):
    """The engine-safe half-up integer division used by every *_e4 ratio
    must equal Python's exact integer arithmetic, including the 2^53
    -adjacent range where a naive double division would misround."""
    from financial_data_engineering_spark.functions.text import (
        int_div_half_up,
    )
    from pyspark.sql import functions as F

    cases = [
        (0, 1),
        (1, 2),
        (1, 3),
        (2, 3),
        (9999, 10000),
        (10000, 10000),
        (123456789, 7),
        (3_500_000_000_000, 700_000_001),
        # near the old double-division ceiling (~2^53), where the
        # retired formulation could misround
        (4_503_599_627_370_000, 999_999_937),
        (4_503_599_627_370_000, 3),
        # far past it: full-int64 magnitudes a multi-MB document's e4
        # quality numerator can reach — the decimal div must stay exact
        (9_007_199_254_740_993, 2),
        (4_500_000_000_000_000_000, 900_000_000_000),
        (9_223_372_036_854_775_807, 9_223_372_036_854_775_807),
        (9_223_372_036_854_775_800, 7),
        (2**53 + 1, 2**53 - 1),
    ]
    df = spark.createDataFrame(cases, "num long, den long")
    got = {
        (r.num, r.den): r.q
        for r in df.select(
            "num", "den", int_div_half_up(F.col("num"), F.col("den")).alias("q")
        ).collect()
    }
    for num, den in cases:
        want = (2 * num + den) // (2 * den)
        assert got[(num, den)] == want, (num, den, got[(num, den)], want)
