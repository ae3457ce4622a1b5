"""Corpus mixture rebalancing: exact per-source quotas toward target weights.

Training-data pipelines rarely use a crawl's natural source mix — they
train on a TARGET mixture ("2 parts code, 1 part web, 3 parts books").
This operator computes, entirely in integer arithmetic, the largest corpus
achievable at the target proportions and selects exactly that many
documents per source, deterministically.

Quota math (all exact integers, so a SQL oracle replays it bit-for-bit):
with per-source counts ``n_s``, integer weights ``w_s`` and ``W = Σ w_s``,
the biggest total honoring the mixture is ``N = min_s (n_s·W div w_s)``;
each source's quota is ``q_s = N·w_s div W`` (≤ n_s by construction).
Selection is the same content-independent ranking the stratified sampler
uses: rank by md5(doc_id) within source, keep the first ``q_s``.

At scale this is two shuffles over the corpus-sized side (the count
aggregate and the rank window, both keyed by source) plus control-plane
joins: the per-source quota table is a handful of rows and broadcasts; the
achievable-N aggregate is ONE row attached via a broadcast nested loop —
a map-side constant, not a shuffle. Skewed sources are bounded by the
window shuffle, which AQE splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.operators.prefix import running_sum


def mixture_quotas(
    docs: DataFrame, weight: Column, source_col: str = "source"
) -> DataFrame:
    """Per-source quota table (source, weight, n_docs, quota) for the
    largest corpus achievable at the target mixture. ``weight`` is an
    integer Column evaluated per row (constant within a source).

    One corpus shuffle (the count aggregate); W and N are unpartitioned
    window aggregates over the RESULTING k-source frame — a single
    one-partition exchange of k rows, which keeps the count lineage
    evaluated exactly once (scalar cross-joins would re-run it per
    consumer) and avoids nested-loop joins entirely."""
    # Quota math divides by wt and W: a zero or negative weight would turn
    # quotas NULL/negative and silently produce an empty or wrong rebalance.
    # The guard lives IN the data path (when/otherwise around the selected
    # value, not a droppable side column) so Catalyst cannot prune it; bad
    # rows raise at execution with the offending value in the message.
    wt_checked = F.when(weight >= 1, weight).otherwise(
        F.raise_error(
            F.concat(
                F.lit("mixture weight must be a positive integer, got "),
                weight.cast("string"),
            )
        )
    )
    cnt = (
        docs.select(F.col(source_col).alias("source"), wt_checked.alias("wt"))
        .groupBy("source", "wt")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    everything = Window.partitionBy()
    return (
        cnt.withColumn("W", F.sum("wt").over(everything))
        .withColumn(
            "N", F.min(F.expr("n_docs * W div wt")).over(everything)
        )
        .select(
            "source",
            F.col("wt").alias("weight"),
            "n_docs",
            F.expr("N * wt div W").alias("quota"),
        )
    )


def mixture_rebalance(
    docs: DataFrame,
    weight: Column,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted downsample to the exact mixture quotas:
    within each source, keep the ``quota`` documents ranking lowest by
    md5(id) — content-independent, reproducible, no RNG state. Returns
    (source, id, quota) for every kept document.

    The rank is the distributed prefix-rank of operators/prefix.py
    (running sum of 1), NOT a source-partitioned row_number: quotas are
    PROPORTIONAL, so the selected set is a constant fraction of a 100 TB
    corpus and a |sources|-task sort would both bottleneck and blow the
    per-task sort budget. (Contrast doc_sample_stratified, whose tiny
    constant cap makes two-phase salted top-k the better shape.)"""
    quotas = mixture_quotas(docs, weight, source_col)
    keyed = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col),
        F.md5(F.col(id_col).cast("string")).alias("_mk"),
    )
    ranked = running_sum(
        keyed, "source", ["_mk", id_col], F.lit(1), out_col="_rn"
    )
    return (
        ranked.join(F.broadcast(quotas.select("source", "quota")), "source")
        .filter(F.col("_rn") <= F.col("quota"))
        .select("source", id_col, "quota")
    )
