"""Incremental corpus ingestion — the steady-state daily pipeline
(extension surface; SURVEY.md §7.4, round-5/6 registry operators).

Yesterday's corpus is never re-processed. The pipeline keeps three
durable registry artifacts between runs:

  - the BLOOM tier: the exact registry's fingerprints collapsed to a
    fixed-size bit table (operators/bloom.py) — megabytes at any corpus
    size, no false negatives;
  - the EXACT registry: distinct content fingerprints seen so far;
  - the NEAR-DUP registry: the banded MinHash key table AND the shingle
    inverted index of ingested docs (bands generate candidates, the
    shingles verify exact Jaccard — neither requires touching the corpus
    again).

Each day's batch then:
  0. bloom-screens map-side: items whose bits aren't all set are
     PROVABLY new and skip the registry join entirely — only the
     maybe-present slice pays step 1's anti-join;
  1. exact-screens against the fingerprint registry
     (llm.dedup.incremental_exact_dedup) — within-batch survivors whose
     content no earlier batch contained;
  2. near-dup-screens the fresh survivors against the banded registry
     (llm.dedup.minhash_registry_matches) — edited-not-copied content,
     each flagged with its best verified registry match;
  3. admits the clean remainder, appends their fingerprints and band
     keys to the registries, and writes compacted parquet.

Costs scale with the BATCH, not the corpus: the fingerprint registry join
keys on uniform md5, the near-dup candidates come from a batch×registry
band equi-join, and registry updates are appends. The streaming twin of
step 2 (streaming.near_dup_screen) runs the same band keys stream-static
against the same registry table on arrival.

Run: python examples/incremental_ingest.py [--sf-dir DIR] [--output DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_data_engineering_spark.functions import text as tx
from financial_data_engineering_spark.llm import dedup as dd
from financial_data_engineering_spark.llm.caching import release_intermediates
from financial_data_engineering_spark.operators.bloom import (
    bloom_build,
    bloom_screen,
)
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.tables import load
from financial_data_engineering_spark.transform.export import (
    write_compacted_parquet,
)


_BLOOM_M = 256
_BLOOM_K = 5


def main(sf_dir: str = "/root/testdata/sf0.001", output_dir: str | None = None) -> dict:
    spark = get_spark("incremental-ingest")
    output_dir = output_dir or tempfile.mkdtemp(prefix="incremental_ingest_")
    docs = load(spark, "documents", sf_dir)

    # Day 0 (bootstrap): even doc_ids are the already-ingested corpus.
    day0 = docs.filter(F.col("doc_id") % 2 == 0)
    fp_registry = dd.exact_survivors(
        day0, "doc_id", tx.fingerprint(F.col("text"))
    ).select("fp")
    inv_registry = dd.shingle_rows(day0, "doc_id", "text", 3)
    band_registry = dd.lsh_band_keys(
        dd.minhash_signatures(inv_registry, "id", "g", 16), bands=4, rows=4
    )
    fp_path = os.path.join(output_dir, "registry_fp")
    inv_path = os.path.join(output_dir, "registry_inv")
    band_path = os.path.join(output_dir, "registry_bands")
    bloom_path = os.path.join(output_dir, "registry_bloom")
    write_compacted_parquet(fp_registry, fp_path, target_rows_per_file=100_000)
    write_compacted_parquet(inv_registry, inv_path, target_rows_per_file=100_000)
    write_compacted_parquet(band_registry, band_path, target_rows_per_file=100_000)
    write_compacted_parquet(
        bloom_build(fp_registry, "fp", m_words=_BLOOM_M, k_hashes=_BLOOM_K),
        bloom_path,
        target_rows_per_file=100_000,
    )

    # Day 1: odd doc_ids arrive. Registries are read back from parquet —
    # the durable state a daily job actually has.
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    n_batch = batch.count()
    fp_reg = spark.read.parquet(fp_path)
    inv_reg = spark.read.parquet(inv_path)
    band_reg = spark.read.parquet(band_path)
    bloom_reg = spark.read.parquet(bloom_path)

    # 0. bloom tier: map-side screen against the bit table. Items whose
    # bits aren't all set are PROVABLY absent from the registry (no
    # false negatives), so only the maybe-present slice pays the
    # registry anti-join below. Same-content duplicates share a
    # fingerprint — hence identical bits — so they land in the same
    # slice and within-batch dedup stays complete per slice.
    batch_fp = batch.withColumn("fp", tx.fingerprint(F.col("text")))
    screened = bloom_screen(
        batch_fp, bloom_reg, "fp", m_words=_BLOOM_M, k_hashes=_BLOOM_K
    )
    provably_new = screened.filter(~F.col("maybe_present")).drop(
        "maybe_present"
    )
    maybe = screened.filter(F.col("maybe_present")).drop("maybe_present")
    n_bloom_new = provably_new.count()

    # 1. exact screen: the provably-new slice needs only within-batch
    # dedup (registry=None); the maybe slice pays the registry anti-join
    fresh_new, _ = dd.incremental_exact_dedup(
        provably_new, None, fingerprint_col=F.col("fp")
    )
    fresh_maybe, _ = dd.incremental_exact_dedup(
        maybe, fp_reg, fingerprint_col=F.col("fp")
    )
    fresh_all = fresh_new.unionByName(fresh_maybe)
    updated_fp = fp_reg.select("fp").unionByName(fresh_all.select("fp"))
    fresh = fresh_all.drop("fp")

    # 2. near-dup screen of the fresh survivors against the PRECOMPUTED
    # registry artifacts — the day-0 corpus is never re-shingled.
    flagged = dd.minhash_registry_matches(
        fresh,
        id_col="doc_id",
        text_col="text",
        n=3,
        k=16,
        bands=4,
        threshold=0.5,
        registry_inv=inv_reg,
        registry_bands=band_reg,
    )
    admitted = fresh.join(
        flagged.select("doc_id"), "doc_id", "left_anti"
    )

    # 3. admit + update registries (append-shaped writes)
    n_fresh = fresh.count()
    n_flagged = flagged.count()
    n_admitted = admitted.count()
    write_compacted_parquet(
        admitted, os.path.join(output_dir, "admitted"), target_rows_per_file=100_000
    )
    write_compacted_parquet(
        updated_fp, fp_path + "_v2", target_rows_per_file=100_000
    )
    # near-dup registry update: append the ADMITTED docs' shingles and
    # band keys so tomorrow's batch screens against today's content too
    inv_new = dd.shingle_rows(admitted, "doc_id", "text", 3)
    band_new = dd.lsh_band_keys(
        dd.minhash_signatures(inv_new, "id", "g", 16), bands=4, rows=4
    )
    write_compacted_parquet(
        inv_reg.unionByName(inv_new), inv_path + "_v2",
        target_rows_per_file=100_000,
    )
    write_compacted_parquet(
        band_reg.unionByName(band_new), band_path + "_v2",
        target_rows_per_file=100_000,
    )
    release_intermediates()

    stats = {
        "batch": n_batch,
        "bloom_provably_new": n_bloom_new,
        "fresh_after_exact": n_fresh,
        "near_dup_flagged": n_flagged,
        "admitted": n_admitted,
        "output_dir": output_dir,
    }
    print(stats)
    # session is shared with callers (tests reuse it); no stop() here
    return stats


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    main(args.sf_dir, args.output)
