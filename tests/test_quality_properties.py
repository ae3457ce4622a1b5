"""Property-based parity tests (hypothesis): the quality rules must match
the reference's pandas semantics on arbitrary small frames — the three
traps SURVEY.md §4 calls out are exactly where hand-picked examples lie:
``duplicated(keep=False)`` groups null keys together, ``str.match`` is
prefix-anchored (not fullmatch), and completeness on empty frames is 1.0.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from financial_data_engineering_spark.quality import (
    CompletenessRule,
    DataValidator,
    PatternRule,
    RangeRule,
    UniquenessRule,
)

# Small frames: ids (with nulls), strings (with nulls), floats (with nulls).
_ids = st.lists(st.one_of(st.none(), st.integers(0, 3)), min_size=0, max_size=8)
_strs = st.lists(
    st.one_of(st.none(), st.sampled_from(["abc", "abcd", "xabc", "", "ab"])),
    min_size=0,
    max_size=8,
)
_vals = st.lists(
    st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
    min_size=0,
    max_size=8,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _frame(spark, ids, strs, vals):
    n = max(len(ids), len(strs), len(vals))
    ids += [None] * (n - len(ids))
    strs += [None] * (n - len(strs))
    vals += [None] * (n - len(vals))
    rows = list(zip(ids, strs, vals))
    return rows, spark.createDataFrame(
        rows, "k int, s string, v double"
    )


@given(ids=_ids, strs=_strs, vals=_vals)
@_SETTINGS
def test_uniqueness_matches_pandas_keep_false(spark, ids, strs, vals):
    rows, df = _frame(spark, ids, strs, vals)
    result = DataValidator("p").add_rule(UniquenessRule(["k"])).validate(df)
    pdf = pd.DataFrame(rows, columns=["k", "s", "v"])
    want_dup = int(pdf.duplicated(subset=["k"], keep=False).sum())
    got = result.results[0]
    assert got.passed == (want_dup == 0)
    if want_dup:
        assert got.details["duplicate_rows"] == want_dup


@given(strs=_strs)
@_SETTINGS
def test_pattern_matches_pandas_prefix_anchor(spark, strs):
    rows, df = _frame(spark, [], list(strs), [])
    result = DataValidator("p").add_rule(PatternRule("s", r"abc")).validate(df)
    series = pd.Series([r[1] for r in rows], dtype="object").dropna().astype(str)
    want_mismatch = int((~series.str.match(r"abc")).sum())
    got = result.results[0]
    assert got.passed == (want_mismatch == 0)
    if not got.passed:
        assert got.details["mismatches"] == want_mismatch


@given(ids=_ids, vals=_vals)
@_SETTINGS
def test_completeness_ratio_matches_pandas(spark, ids, vals):
    rows, df = _frame(spark, list(ids), [], list(vals))
    result = (
        DataValidator("p")
        .add_rule(CompletenessRule(["v"], threshold=0.5))
        .validate(df)
    )
    pdf = pd.DataFrame(rows, columns=["k", "s", "v"])
    ratio = pdf["v"].notna().sum() / len(pdf) if len(pdf) else 1.0
    assert result.results[0].passed == (ratio >= 0.5)


@given(vals=_vals)
@_SETTINGS
def test_range_counts_match_pandas(spark, vals):
    rows, df = _frame(spark, [], [], list(vals))
    result = (
        DataValidator("p")
        .add_rule(RangeRule("v", min_val=-10.0, max_val=10.0))
        .validate(df)
    )
    series = pd.Series([r[2] for r in rows], dtype="float64").dropna()
    want = int((series < -10.0).sum() + (series > 10.0).sum())
    got = result.results[0]
    assert got.passed == (want == 0)
    if not got.passed:
        assert got.details["violations"] == want
