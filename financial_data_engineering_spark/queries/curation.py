"""Corpus-curation queries over ``documents`` — the sampling / packing /
vocabulary layer of a training-data pipeline (SURVEY.md §7.4 extensions,
beyond the dedup/similarity families in queries.dedup / queries.similarity).

Every query is deterministic and float-free (ratios emitted as half-up
scaled integers), so the DuckDB oracle pins it bit-for-bit:

- ``doc_sample_stratified``: balanced per-source downsampling by ranking
  on a content-independent hash — the "cap every crawl source at N docs"
  op that keeps a corpus from being dominated by its biggest source.
- ``doc_pack_bins``: token-budget packing — assign consecutive documents
  to fixed-budget training bins via a running token sum.
- ``source_vocab_stats``: tokens / distinct types / type-token ratio per
  source — the vocabulary-diversity screen for low-quality sources.
- ``top_bigrams``: corpus-wide bigram frequency top-k — boilerplate and
  contamination detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.functions import text as tx
from financial_data_engineering_spark.llm.dedup import tokens
from financial_data_engineering_spark.operators.packing import pack_bins
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

#: documents kept per source by the stratified sampler.
SAMPLE_PER_SOURCE = 10
#: token budget per packing bin.
BIN_TOKENS = 512
#: bigrams reported by top_bigrams.
TOP_BIGRAMS_K = 20


@register(
    "doc_sample_stratified",
    oracle=f"""
    SELECT source, doc_id FROM (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                   ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
        FROM documents
    ) WHERE rn <= {SAMPLE_PER_SOURCE}
    ORDER BY source, doc_id
    """,
)
def doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: keep the ``SAMPLE_PER_SOURCE``
    documents per source that rank lowest by md5(doc_id) — a balanced
    cap-per-source downsampler whose selection is content-independent,
    reproducible, and engine-replayable (no RNG state).

    One shuffle keyed by source. The rank-window form is right when the
    per-source cap is small (it is a per-group top-k); for rate-based
    sampling at the 100 TB tier, filter on a hash threshold instead
    (``md5 < p·2^128`` needs no window and no sort at all) — same
    determinism, zero shuffle."""
    docs = load(spark, "documents", sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_PER_SOURCE)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@register(
    "doc_pack_bins",
    oracle=f"""
    WITH toks AS (
        SELECT source, doc_id, {tx.sql_token_count('text')} AS t
        FROM documents
    ), cum AS (
        SELECT source, doc_id, t,
               sum(t) OVER (PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
        FROM toks
    )
    SELECT source,
           CAST((c - t) // {BIN_TOKENS} AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(t) AS BIGINT) AS bin_tokens
    FROM cum
    GROUP BY source, bin_id
    ORDER BY source, bin_id
    """,
)
def doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: walk each source's documents in doc_id order,
    keep a running token sum, and assign each document to bin
    ``floor(tokens_before / BIN_TOKENS)`` — the streaming approximation of
    packing documents into fixed-budget training sequences (a bin may
    overflow by at most one document, never underfill by more than the
    last document — the same guarantee greedy sequence packing gives).
    Pure integer arithmetic end to end.

    Plan: one shuffle keyed by source for the running-sum window, then a
    map-side-combinable rollup on (source, bin). At 100 TB the window
    partitions by source — if single sources are huge, sub-partition the
    running sum by (source, day) the way the streaming layer buckets
    events."""
    docs = load(spark, "documents", sf_dir)
    packed = pack_bins(
        docs.select("source", "doc_id", tx.token_count(F.col("text")).alias("t")),
        "source",
        "doc_id",
        "t",
        BIN_TOKENS,
    )
    return (
        packed.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("t").cast("long")).alias("bin_tokens"),
        )
        .orderBy("source", "bin_id")
    )


@register(
    "source_vocab_stats",
    oracle="""
    WITH tok AS (
        SELECT source,
               unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
        FROM documents
    ), agg AS (
        SELECT source,
               count(*) AS n_tokens,
               count(DISTINCT tok) AS n_types
        FROM tok WHERE tok != ''
        GROUP BY source
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST((2 * n_types * 10000 + n_tokens) // (2 * n_tokens) AS BIGINT)
               AS ttr_e4
    FROM agg
    ORDER BY source
    """,
)
def source_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary diversity per source: total tokens, distinct types, and
    the type-token ratio as a half-up scaled integer (``ttr_e4`` = TTR ×
    10⁴ — float-free like every ratio in this engine). Low TTR flags
    templated/boilerplate sources before they flood a training mix.

    Plan: explode tokens (map-side), then one aggregation keyed by source
    with a distinct on (source, token) — two shuffles total, both on keys
    with source-bounded cardinality; at 100 TB swap the exact distinct for
    approx_count_distinct and keep the same query shape."""
    docs = load(spark, "documents", sf_dir)
    return (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("n_types"),
        )
        .select(
            "source",
            "n_tokens",
            "n_types",
            F.expr("(2 * n_types * 10000 + n_tokens) div (2 * n_tokens)").alias(
                "ttr_e4"
            ),
        )
        .orderBy("source")
    )


@register(
    "top_bigrams",
    oracle=f"""
    WITH arrs AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS a
        FROM documents
    ), bg AS (
        SELECT unnest(list_transform(range(1, len(a)),
                      j -> a[CAST(j AS INT)] || ' '
                           || a[CAST(j + 1 AS INT)])) AS bigram
        FROM arrs
    )
    SELECT bigram, count(*) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT {TOP_BIGRAMS_K}
    """,
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequency top-k — the boilerplate /
    benchmark-contamination screen. Positioned bigrams come from the same
    posexplode + lead plan as winnowing's shingles (position-sensitive,
    duplicates kept); the count is a map-side-combinable groupBy and the
    top-k plans as TakeOrderedAndProject (no full sort materializes).
    Ties broken by bigram text for cross-engine determinism."""
    docs = load(spark, "documents", sf_dir)
    tok_rows = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        tok_rows.select(
            F.concat_ws(" ", F.col("tok"), F.lead("tok", 1).over(w)).alias(
                "bigram"
            ),
            F.lead("tok", 1).over(w).alias("_nxt"),
        )
        .filter(F.col("_nxt").isNotNull())
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(TOP_BIGRAMS_K)
    )
