"""End-to-end training-corpus curation — the LLM-data-pipeline example
(the extension surface beyond the reference's examples; SURVEY.md §7.4).

Flow over the ``documents`` table:
  1. exact-dedup: drop every non-survivor of a fingerprint group
     (md5 of whitespace-normalized lowercase text, min-id survives);
  2. decontaminate: drop training docs sharing >= 2 distinct 5-gram
     shingles with the held-out eval slice (broadcast eval index — the
     corpus never shuffles for this step);
  3. quality gate: keep documents with quality_score >= 0.5
     (length/punctuation/stopword composite — all codegen expressions);
  4. balance: weighted mixture rebalance to exact integer quotas
     (every source downsampled toward target weights, md5-rank
     selection), then a stratified hard cap per source;
  5. pack: assign survivors to fixed-token-budget training bins via a
     running token sum;
  6. write the curated corpus parquet, partitioned by source.

Every step is a lazy DataFrame transform — one pipeline, no driver-side
row handling; the only actions are the final counts and the write.

Run: python examples/curate_training_corpus.py [--sf-dir DIR] [--output DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.functions import text as tx
from financial_data_engineering_spark.llm import dedup as dd
from financial_data_engineering_spark.operators.mixing import mixture_rebalance
from financial_data_engineering_spark.operators.packing import pack_bins
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.tables import load

PER_SOURCE_CAP = 15
BIN_TOKENS = 512


def main(sf_dir: str = "/root/testdata/sf0.001", output_dir: str | None = None) -> dict:
    spark = get_spark("curate-training-corpus")
    output_dir = output_dir or tempfile.mkdtemp(prefix="curated_corpus_")
    docs = load(spark, "documents", sf_dir)
    n_raw = docs.count()

    # 1. exact dedup: survivors = min doc_id per fingerprint group
    survivors = dd.exact_survivors(
        docs, "doc_id", tx.fingerprint(F.col("text"))
    ).select(F.col("doc_id"))
    deduped = docs.join(survivors, "doc_id")

    # 1b. decontaminate against the held-out eval slice (md5-prefix 1/8
    # split here; in production, the benchmark suites). Contaminated ids
    # leave via a broadcast anti-join — no corpus shuffle.
    is_eval = F.expr("substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')")
    contaminated = dd.contamination_pairs(
        deduped.filter(~is_eval),
        deduped.filter(is_eval),
        "doc_id",
        "text",
        n=5,
        min_shared=2,
    ).select(F.col("train_id").alias("doc_id")).distinct()
    deduped = deduped.filter(~is_eval).join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    )

    # 2. quality gate (parts computed once — see quality_from_parts)
    scored = deduped.select(
        "doc_id",
        "source",
        "lang",
        "text",
        tx.token_count(F.col("text")).alias("n_tokens"),
        tx.stopword_hits(F.col("text"), "en").alias("_stops"),
        tx.punct_ratio(F.col("text")).alias("_praw"),
    ).select(
        "doc_id",
        "source",
        "lang",
        "text",
        "n_tokens",
        tx.quality_from_parts(
            F.col("n_tokens"), F.col("_stops"), F.col("_praw")
        ).alias("quality"),
    )
    kept = scored.filter(F.col("quality") >= 0.5)

    # 3. weighted mixture rebalance (sources get 1/2/3 weights from their
    # name) down to the largest corpus achievable at those proportions,
    # then the stratified hard cap per source on what remains
    weight = F.expr("1 + (CAST(substr(source, 4, 10) AS INT) % 3)")
    quota_ids = mixture_rebalance(kept, weight, "source", "doc_id").select(
        "doc_id"
    )
    rebalanced = kept.join(quota_ids, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    balanced = (
        rebalanced.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= PER_SOURCE_CAP)
        .drop("_rn")
    )

    # 4. token-budget packing (running sum per source)
    packed = pack_bins(balanced, "source", "doc_id", "n_tokens", BIN_TOKENS)

    # 5. write, partitioned by source (partition pruning for per-source reads)
    packed.write.mode("overwrite").partitionBy("source").parquet(output_dir)

    curated = spark.read.parquet(output_dir)
    stats = {
        "n_raw": n_raw,
        "n_curated": curated.count(),
        "n_sources": curated.select("source").distinct().count(),
        "n_bins": curated.select("source", "bin_id").distinct().count(),
        "output_dir": output_dir,
    }
    print(
        f"curated {stats['n_curated']}/{stats['n_raw']} docs across "
        f"{stats['n_sources']} sources into {stats['n_bins']} bins -> {output_dir}"
    )
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    main(sf_dir=args.sf_dir, output_dir=args.output)
