"""Misra-Gries heavy hitters: frequent items in bounded memory.

Exact top-k (operators/relational.py ``value_counts``) shuffles every
distinct key; when the key domain is huge (URLs, n-grams, user agents)
and only the heavy tail matters, the Misra-Gries summary answers with k
counters per partition and ONE k-row-per-partition shuffle, at the cost
of a bounded underestimate.

This is the mergeable-summaries form (Agarwal et al., PODS 2012): each
partition folds its Arrow batches into a k-counter summary — add the
batch's exact counts, then if more than k counters remain, subtract the
(k+1)-th largest value from all and drop the non-positive (recording the
subtraction as this partition's error mass). Partition summaries then
merge by plain count addition, keeping the guarantee:

    est(item) <= true(item) <= est(item) + err_bound

where ``err_bound`` (the summed subtractions) is itself <= n/(k+1).
Every non-null item with true count > err_bound is guaranteed present
in the full merged summary.

Python runs only inside Arrow batches (mapInPandas over pre-projected
single-column rows), vectorized through pandas ``value_counts`` — no
row-at-a-time UDF, no driver-side data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: marker row carrying a partition's error mass (item is NULL).
_SUMMARY_SCHEMA = "item string, cnt long"


def _partition_summaries(k: int):
    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series = pd.Series(dtype="int64")
        err = 0
        for pdf in batches:
            batch = pdf["item"].value_counts()
            counters = counters.add(batch, fill_value=0).astype("int64")
            if len(counters) > k:
                # subtract the (k+1)-th largest from everything: at most
                # k counters stay positive, and every dropped/shrunk
                # count is off by exactly the subtraction.
                m = int(counters.nlargest(k + 1).iloc[-1])
                counters = counters - m
                counters = counters[counters > 0]
                err += m
        out = pd.DataFrame(
            {"item": counters.index.astype(str), "cnt": counters.values}
        )
        marker = pd.DataFrame({"item": [None], "cnt": [err]})
        yield pd.concat([out, marker], ignore_index=True)

    return fold


def misra_gries_topk(
    df: DataFrame,
    item_col: str,
    k: int,
    top: int | None = None,
) -> DataFrame:
    """Approximate heavy hitters over ``item_col`` with k counters per
    partition. Returns (item, est_count, err_bound) ordered by estimated
    count descending (then item).

    ``est_count`` never exceeds the true count; the true count never
    exceeds ``est_count + err_bound``; any NON-NULL item whose true count
    exceeds ``err_bound`` is guaranteed to appear — in the FULL summary,
    which is what the default returns (at most k × |partitions| rows).
    Passing ``top`` truncates to the ``top`` highest estimates as a view
    convenience and forfeits that presence guarantee for items below the
    cut (truncation cannot be error-accounted after the merge).

    Null items are excluded before summarization (``value_counts`` cannot
    see them and null is the summary's error-mass marker); count nulls
    separately if they matter.

    The summary can come back EMPTY when the error mass dominates every
    counter (pathologically small k vs. a flat distribution — e.g. two
    distinct singletons with k=1 tie at the subtracted value and both
    drop). An empty result means no item's true count exceeds n/(k+1):
    raise k until the hitters you care about clear that bar.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rows = df.select(F.col(item_col).cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    summaries = rows.mapInPandas(
        _partition_summaries(k), schema=_SUMMARY_SCHEMA
    )
    return merge_summaries(summaries, top=top)


def merge_summaries(summaries: DataFrame, top: int | None = None) -> DataFrame:
    """Merge (item, cnt) summary rows — NULL-item rows carry error mass —
    into (item, est_count, err_bound). Plain count addition: the
    mergeable-summaries property, shared by the batch operator above and
    the streaming twin's final per-shard snapshots
    (streaming/stateful.py ``running_heavy_hitters``), so both paths keep
    est <= true <= est + err_bound by the same arithmetic."""
    # constant-key equi-join attaches the global error mass as a 1-row
    # broadcast hash join (not a nested-loop cross join).
    items = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("est_count"))
        .withColumn("_k", F.lit("_"))
    )
    err = (
        summaries.filter(F.col("item").isNull())
        .agg(F.sum("cnt").alias("err_bound"))
        .withColumn("_k", F.lit("_"))
    )
    out = (
        items.join(F.broadcast(err), "_k")
        .select(
            "item",
            "est_count",
            F.coalesce("err_bound", F.lit(0)).alias("err_bound"),
        )
        .orderBy(F.col("est_count").desc(), "item")
    )
    return out.limit(top) if top is not None else out
