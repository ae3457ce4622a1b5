"""Invariant tests for the corpus-curation queries (sampling, packing,
vocabulary) at sf0.001 — the oracle gate pins exact values at sf0.01;
these pin the structural guarantees the docstrings promise."""

from __future__ import annotations

import pytest

from financial_data_engineering_spark import plans
from financial_data_engineering_spark.queries import curation
from financial_data_engineering_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_count(spark):
    return load(spark, "documents", SF_DIR).count()


def test_stratified_sample_caps_every_source(spark):
    rows = curation.doc_sample_stratified(spark, SF_DIR).collect()
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert per_source
    assert all(n <= curation.SAMPLE_PER_SOURCE for n in per_source.values())
    # deterministic: same selection on a second run
    again = curation.doc_sample_stratified(spark, SF_DIR).collect()
    assert [(r["source"], r["doc_id"]) for r in rows] == [
        (r["source"], r["doc_id"]) for r in again
    ]


def test_pack_bins_partitions_the_corpus_exactly(spark, docs_count):
    from pyspark.sql import functions as F

    from financial_data_engineering_spark.functions import text as tx

    bins = curation.doc_pack_bins(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in bins) == docs_count
    total_tokens = (
        load(spark, "documents", SF_DIR)
        .select(F.sum(tx.token_count(F.col("text")).cast("long")).alias("t"))
        .collect()[0]["t"]
    )
    assert sum(r["bin_tokens"] for r in bins) == total_tokens
    # bin ids are contiguous from 0 within each source
    by_source: dict[str, list[int]] = {}
    for r in bins:
        by_source.setdefault(r["source"], []).append(r["bin_id"])
    for ids in by_source.values():
        assert sorted(ids) == list(range(len(ids)))
    # a bin starts only when the previous ones consumed their budget: every
    # non-final bin holds at least one document and the running sum entering
    # a bin is >= bin_id * BIN_TOKENS by construction of the assignment
    assert all(r["n_docs"] >= 1 for r in bins)


def test_pack_bins_matches_python_reference(spark):
    """Property check: the window-based packing equals the sequential
    Python walk (bin = weight_before // budget) on randomized groups."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from financial_data_engineering_spark.operators.packing import pack_bins

    weights = st.lists(st.integers(0, 700), min_size=1, max_size=12)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(wa=weights, wb=weights, budget=st.sampled_from([1, 100, 512]))
    def check(wa, wb, budget):
        rows = [("a", i, w) for i, w in enumerate(wa)] + [
            ("b", i, w) for i, w in enumerate(wb)
        ]
        df = spark.createDataFrame(rows, "g string, i int, w int")
        got = {
            (r["g"], r["i"]): r["bin_id"]
            for r in pack_bins(df, "g", "i", "w", budget).collect()
        }
        for g, ws in (("a", wa), ("b", wb)):
            before = 0
            for i, w in enumerate(ws):
                assert got[(g, i)] == before // budget, (g, i, budget)
                before += w

    check()


def test_vocab_stats_bounds(spark):
    rows = curation.source_vocab_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_types"] <= r["n_tokens"]
        assert 0 < r["ttr_e4"] <= 10_000


def test_curation_plan_shapes_frozen(spark):
    """Exchange budgets for the curation family (plan snapshot, same idea
    as the dedup-family freeze): a regression that adds a shuffle here is
    a regression that adds a network pass over the corpus at 100 TB. No
    nested-loop joins anywhere; top_bigrams' top-k must plan as
    TakeOrderedAndProject (no full-sort exchange for a LIMIT k)."""
    budgets = {
        # two-phase salted top-k: (source,salt) window + source window
        # over the bounded union + presentation sort
        "doc_sample_stratified": 3,
        # distributed prefix sum (operators/prefix.py): range exchange
        # + control-plane offsets agg + offsets window + (source,bin)
        # rollup + presentation sort
        "doc_pack_bins": 5,
        # explode is map-side; distinct agg (2-phase) + presentation sort
        "source_vocab_stats": 3,
        # window(doc_id) + count agg; top-k is TakeOrdered, not a sort
        "top_bigrams": 2,
    }
    for name, budget in budgets.items():
        df = getattr(curation, name)(spark, SF_DIR)
        assert plans.shuffle_count(df) <= budget, name
        assert plans.nested_loop_join_count(df) == 0, name
    assert "TakeOrderedAndProject" in plans.plan_text(
        curation.top_bigrams(spark, SF_DIR)
    )


def test_top_bigrams_ranked_and_capped(spark):
    df = curation.top_bigrams(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) <= curation.TOP_BIGRAMS_K
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(" " in r["bigram"] for r in rows)
    # sort+limit must plan as TakeOrderedAndProject (no full sort at scale)
    assert "TakeOrderedAndProject" in plans.plan_text(df)


def test_mixture_quotas_integer_math(spark):
    """Hand-checked quota math: sources a(30 docs, w=1), b(10, w=2).
    W=3; N = min(30*3//1, 10*3//2) = min(90, 15) = 15;
    q_a = 15*1//3 = 5, q_b = 15*2//3 = 10."""
    from financial_data_engineering_spark.operators.mixing import mixture_quotas
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("a", i) for i in range(30)] + [("b", 100 + i) for i in range(10)],
        "source string, doc_id long",
    )
    wt = F.when(F.col("source") == "b", F.lit(2)).otherwise(F.lit(1))
    got = {
        r.source: (r.weight, r.n_docs, r.quota)
        for r in mixture_quotas(docs, wt).collect()
    }
    assert got == {"a": (1, 30, 5), "b": (2, 10, 10)}


def test_mixture_rebalance_exact_and_deterministic(spark):
    """Rebalance keeps exactly the quota per source and the selection is
    stable across runs (md5 ranking, no RNG)."""
    from financial_data_engineering_spark.operators.mixing import (
        mixture_quotas,
        mixture_rebalance,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [("a", i) for i in range(30)] + [("b", 100 + i) for i in range(10)],
        "source string, doc_id long",
    )
    wt = F.when(F.col("source") == "b", F.lit(2)).otherwise(F.lit(1))
    quotas = {r.source: r.quota for r in mixture_quotas(docs, wt).collect()}
    kept = mixture_rebalance(docs, wt).groupBy("source").count().collect()
    assert {r.source: r["count"] for r in kept} == quotas
    first = sorted(r.doc_id for r in mixture_rebalance(docs, wt).collect())
    second = sorted(r.doc_id for r in mixture_rebalance(docs, wt).collect())
    assert first == second


def test_dense_row_ids_matches_global_row_number(spark):
    """The distributed offset construction must equal the single-partition
    global window, including across many partitions and with a
    non-trivial order key."""
    from financial_data_engineering_spark.operators.ids import dense_row_ids
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.range(0, 997).select(
        (F.col("id") * 7919 % 997).alias("k"), F.col("id").alias("payload")
    )
    got = dense_row_ids(df, ["k"], num_partitions=13)
    want = df.withColumn(
        "seq_id", F.row_number().over(Window.orderBy("k"))
    )
    assert sorted((r.k, r.seq_id) for r in got.collect()) == sorted(
        (r.k, r.seq_id) for r in want.collect()
    )
    # ids are a dense 1..N permutation
    n = df.count()
    ids = sorted(r.seq_id for r in got.collect())
    assert ids == list(range(1, n + 1))


def test_mixture_quotas_rejects_nonpositive_weights(spark):
    """Zero/negative weights would NULL-out the integer quota math; the
    in-path guard must raise at execution instead of silently returning
    garbage quotas."""
    from pyspark.sql import functions as F

    from financial_data_engineering_spark.operators.mixing import mixture_quotas

    docs = spark.createDataFrame(
        [("a", 1), ("b", 2)], "source string, doc_id long"
    )
    bad = F.when(F.col("source") == "a", F.lit(0)).otherwise(F.lit(1))
    with pytest.raises(Exception, match="positive integer"):
        mixture_quotas(docs, bad).collect()


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_running_sum_matches_single_window(spark, n_parts):
    """The distributed two-level prefix sum (operators/prefix.py) is
    bit-identical to one group-partitioned window at ANY partition
    count — including n=1 (degenerate single segment) and counts that
    split groups across partition boundaries."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from financial_data_engineering_spark.operators.prefix import running_sum

    rng = random.Random(42)
    rows = [
        (f"g{rng.randrange(4)}", i, rng.randrange(1, 50))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, i long, w long")
    got = {
        (r.g, r.i): r.c
        for r in running_sum(
            df, "g", ["i"], "w", out_col="c", num_partitions=n_parts
        ).collect()
    }
    w = (
        Window.partitionBy("g")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r.g, r.i): r.c
        for r in df.withColumn("c", F.sum("w").over(w)).collect()
    }
    assert got == want
