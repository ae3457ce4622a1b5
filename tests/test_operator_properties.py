"""Property-based parity for the round-4 operators: each distributed
implementation must match a naive Python reference on arbitrary small
inputs — the bucketing, quota, and shingle arithmetic are exactly where
hand-picked examples can lie (boundary buckets, rounding ties, short
documents).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_intervals = st.lists(
    st.tuples(st.integers(0, 60), st.integers(1, 25)),  # (start, width)
    min_size=0,
    max_size=6,
)
_points = st.lists(st.integers(0, 90), min_size=0, max_size=8)


@_SETTINGS
@given(points=_points, intervals=_intervals, width=st.integers(1, 40))
def test_point_in_interval_matches_naive(spark, points, intervals, width):
    from financial_data_engineering_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)] or [(None, None)],
        "pid int, p long",
    ).filter(F.col("pid").isNotNull())
    idf = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(intervals)]
        or [(None, None, None)],
        "iid int, s long, e long",
    ).filter(F.col("iid").isNotNull())
    got = sorted(
        (r.pid, r.iid)
        for r in point_in_interval_join(
            pdf, idf, "p", "s", "e", bucket_width=width
        ).collect()
    )
    want = sorted(
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, (s, w) in enumerate(intervals)
        if s <= p < s + w
    )
    assert got == want


@_SETTINGS
@given(left=_intervals, right=_intervals, width=st.integers(1, 40))
def test_interval_overlap_matches_naive(spark, left, right, width):
    from financial_data_engineering_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ldf = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(left)]
        or [(None, None, None)],
        "lid int, ls long, le long",
    ).filter(F.col("lid").isNotNull())
    rdf = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(right)]
        or [(None, None, None)],
        "rid int, rs long, re long",
    ).filter(F.col("rid").isNotNull())
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, "ls", "le", "rs", "re", bucket_width=width
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, (ls, lw) in enumerate(left)
        for ri, (rs, rw) in enumerate(right)
        if ls < rs + rw and rs < ls + lw
    )
    assert got == want


_weights = st.lists(st.integers(1, 4), min_size=1, max_size=4)
_counts = st.lists(st.integers(1, 12), min_size=1, max_size=4)


@_SETTINGS
@given(data=st.data())
def test_mixture_quota_invariants(spark, data):
    """q_s <= n_s always; sum over sources of (q_s proportional error)
    bounded by one unit of integer floor per source; the achievable-N
    bound is tight: scaling any quota up by the mixture would exceed
    some source's count."""
    from financial_data_engineering_spark.operators.mixing import mixture_quotas

    weights = data.draw(_weights)
    counts = data.draw(
        st.lists(
            st.integers(1, 12), min_size=len(weights), max_size=len(weights)
        )
    )
    rows = [
        (f"s{si}", si * 1000 + i)
        for si, n in enumerate(counts)
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "source string, doc_id long")
    wmap = {f"s{si}": w for si, w in enumerate(weights)}
    # expression form to stay off Python UDFs: chained when/otherwise
    expr = F.lit(None).cast("int")
    for src, wt in wmap.items():
        expr = F.when(F.col("source") == src, F.lit(wt)).otherwise(expr)
    quotas = {
        r.source: (r.weight, r.n_docs, r.quota)
        for r in mixture_quotas(docs, expr).collect()
    }
    W = sum(weights)
    N = min(n * W // w for n, w in zip(counts, weights))
    for si, (w, n) in enumerate(zip(weights, counts)):
        got_w, got_n, got_q = quotas[f"s{si}"]
        assert got_w == w and got_n == n
        assert got_q == N * w // W
        assert got_q <= n


@_SETTINGS
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=2,
        max_size=6,
    ),
    n=st.integers(2, 4),
    min_shared=st.integers(1, 3),
)
def test_contamination_matches_naive_shingle_sets(spark, texts, n, min_shared):
    from financial_data_engineering_spark.llm.dedup import contamination_pairs

    def grams(t):
        toks = t.split()
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    half = len(texts) // 2
    train, ev = texts[:half], texts[half:]
    tdf = spark.createDataFrame(
        list(enumerate(train)) or [(None, None)], "doc_id long, text string"
    ).filter(F.col("doc_id").isNotNull())
    edf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ev)] or [(None, None)],
        "doc_id long, text string",
    ).filter(F.col("doc_id").isNotNull())
    got = sorted(
        (r.train_id, r.eval_id, r.n_shared)
        for r in contamination_pairs(
            tdf, edf, "doc_id", "text", n=n, min_shared=min_shared
        ).collect()
    )
    want = sorted(
        (ti, 100 + ei, len(grams(tt) & grams(et)))
        for ti, tt in enumerate(train)
        for ei, et in enumerate(ev)
        if len(grams(tt) & grams(et)) >= min_shared
    )
    assert got == want


@_SETTINGS
@given(
    keys_a=st.lists(st.integers(0, 200), min_size=0, max_size=40),
    keys_b=st.lists(st.integers(0, 200), min_size=0, max_size=40),
)
def test_kmv_intersection_exact_under_k(spark, keys_a, keys_b):
    """With |A ∪ B| < k the union sketch holds every hash, so the
    estimator must return the EXACT union/intersection/Jaccard — on
    arbitrary overlapping key sets, not just the hand-picked example."""
    from financial_data_engineering_spark.operators.sketch import (
        kmv_intersection,
    )

    rows = [("A", k) for k in keys_a] + [("B", k) for k in keys_b]
    if not rows:
        return
    df = spark.createDataFrame(rows, "grp string, key long")
    got = kmv_intersection(df, "grp", "key", "A", "B", k=256).collect()[0]
    sa, sb = set(keys_a), set(keys_b)
    union, inter = sa | sb, sa & sb
    assert got["union_estimate"] == len(union)
    assert got["inter_sketch_keys"] == len(inter)
    assert got["inter_estimate"] == len(inter)
    if union:
        expect_e4 = (2 * len(inter) * 10000 + len(union)) // (2 * len(union))
        assert got["jaccard_e4"] == expect_e4


@_SETTINGS
@given(
    texts=st.lists(
        st.text(
            alphabet="abcdef ", min_size=0, max_size=30
        ),
        min_size=1,
        max_size=12,
    )
)
def test_content_split_equals_naive_md5_bucketing(spark, texts):
    """content_split must equal the naive Python md5-bucket computation on
    arbitrary text (including whitespace-only and empty strings), and be
    invariant to leading/trailing/internal whitespace runs."""
    import hashlib
    import re

    from financial_data_engineering_spark.functions.text import content_split

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["split"]
        for r in df.select(
            "doc_id", content_split(F.col("text")).alias("split")
        ).collect()
    }

    def naive(t):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        b = int(hashlib.md5(norm.encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    for i, t in enumerate(texts):
        assert got[i] == naive(t), (t, got[i], naive(t))
