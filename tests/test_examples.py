"""The flagship example must run end-to-end offline: extraction (canned
payloads) → fusion → quality gate → star schema parquet with zero orphans.
"""

from __future__ import annotations

import sys


def test_multi_source_pipeline_offline(spark, tmp_path):
    sys.path.insert(0, "examples")
    from examples.multi_source_pipeline import main

    out = main(output_dir=str(tmp_path))
    assert all(r.success for r in out["results"].values())
    assert out["fused_rows"] == 3
    assert out["report"].passed
    assert out["build"].success
    assert out["build"].rows_by_table == {
        "dim_country": 3,
        "fact_country_indicators": 3,
    }
    assert set(out["orphans"].values()) == {0}
    # written parquet is readable with the expected grain
    dim = spark.read.parquet(str(tmp_path / "dim_country"))
    assert dim.count() == 3 and "country_sk" in dim.columns


def test_curate_training_corpus(spark, tmp_path):
    from examples.curate_training_corpus import PER_SOURCE_CAP, main

    out = main(sf_dir="/root/testdata/sf0.001", output_dir=str(tmp_path))
    assert 0 < out["n_curated"] <= out["n_raw"]
    curated = spark.read.parquet(str(tmp_path))
    # curation invariants: dedup + quality gate + per-source cap all held
    assert curated.count() == curated.select("doc_id").distinct().count()
    assert curated.filter("quality < 0.5").count() == 0
    from pyspark.sql import functions as F

    caps = curated.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    assert caps <= PER_SOURCE_CAP
    assert "bin_id" in curated.columns
    # partitioned layout: per-source directories exist on disk
    assert any(p.name.startswith("source=") for p in tmp_path.iterdir())


def test_validate_federal_awards_offline(spark):
    from examples.validate_federal_awards import main

    out = main(live=False)
    assert out["result"].success and out["result"].records == 25
    assert out["report"].passed
    assert out["stats"]["n_agencies"] == 3
    df = out["result"].data
    assert df.schema["award_amount"].dataType.typeName() == "double"


def test_validate_sec_filings_offline(spark):
    from examples.validate_sec_filings import main

    out = main(live=False)
    assert out["result"].success and out["result"].records == 5
    assert out["report"].passed
    rows = {r["ticker"]: r["cik"] for r in out["result"].data.collect()}
    assert rows["AAPL"] == "0000320193"
    assert all(len(c) == 10 for c in rows.values())


def test_collect_earthquakes_offline(spark):
    from examples.collect_earthquakes import main

    out = main(live=False)
    assert out["result"].success and out["result"].records == 40
    strongest = out["strongest"].collect()
    assert len(strongest) == 10
    mags = [r["magnitude"] for r in strongest]
    assert mags == sorted(mags, reverse=True)
    assert out["depth"]["max"] is not None


def test_collect_economic_indicators_offline(spark):
    from examples.collect_economic_indicators import main

    out = main(live=False)
    assert out["result"].success
    latest = out["latest"].collect()
    # 3 countries x 2 indicators, null-valued 2021 rows dropped, 2023 wins
    assert len(latest) == 6
    assert all(r["year"] == 2023 for r in latest)
    vals = [r["value"] for r in latest]
    assert vals == sorted(vals, reverse=True)

def test_generate_sample_reports(spark, tmp_path, monkeypatch):
    """The published sample-report artifacts regenerate deterministically:
    three validation reports (JSON + text) and a corpus profile."""
    import json

    from examples import generate_sample_reports as g

    monkeypatch.setattr(g, "SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setattr("sys.argv", ["generate_sample_reports.py", str(tmp_path)])
    g.main()

    for name in ("orders_quality", "lineitem_quality", "documents_quality"):
        payload = json.loads((tmp_path / f"{name}.json").read_text())
        assert payload["name"] == name
        assert payload["summary"]["total_rules"] == len(payload["results"])
        assert (tmp_path / f"{name}.txt").read_text().strip()
    profile = json.loads((tmp_path / "corpus_profile.json").read_text())
    assert profile["sources"] and all(s["n_docs"] > 0 for s in profile["sources"])

def test_curate_corpus_excludes_eval_and_contaminated(spark, tmp_path):
    """The decontamination stage must drop both the eval slice itself and
    every training doc flagged as contaminated."""
    from pyspark.sql import functions as F

    from examples.curate_training_corpus import main
    from financial_data_engineering_spark.llm import dedup as dd
    from financial_data_engineering_spark.tables import load

    out = main(sf_dir="/root/testdata/sf0.001", output_dir=str(tmp_path))
    curated = spark.read.parquet(str(tmp_path))
    is_eval = F.expr("substr(md5(CAST(doc_id AS STRING)), 1, 1) IN ('0', '1')")
    assert curated.filter(is_eval).count() == 0

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    flagged = dd.contamination_pairs(
        docs.filter(~is_eval), docs.filter(is_eval), "doc_id", "text",
        n=5, min_shared=2,
    ).select(F.col("train_id").alias("doc_id")).distinct()
    assert curated.join(flagged, "doc_id").count() == 0
    assert out["n_curated"] > 0


def test_incremental_ingest_round_trip(spark, tmp_path):
    """The daily ingest shape: registries persist to parquet between
    'days', the batch screens against them, admitted = fresh minus
    near-dup-flagged, and the updated fingerprint registry covers both
    batches' content."""
    from examples.incremental_ingest import main

    out = main(sf_dir="/root/testdata/sf0.001", output_dir=str(tmp_path))
    assert out["admitted"] == out["fresh_after_exact"] - out["near_dup_flagged"]
    assert 0 < out["admitted"] <= out["batch"]
    # the bloom tier may only EXEMPT items from the registry join, never
    # change the outcome: sliced fresh must equal the direct (no-bloom)
    # incremental screen
    from pyspark.sql import functions as F

    from financial_data_engineering_spark.llm import dedup as dd
    from financial_data_engineering_spark.tables import load

    docs = load(spark, "documents", "/root/testdata/sf0.001")
    direct, _ = dd.incremental_exact_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        spark.read.parquet(str(tmp_path / "registry_fp")),
    )
    assert direct.count() == out["fresh_after_exact"]
    assert 0 <= out["bloom_provably_new"] <= out["batch"]
    admitted = spark.read.parquet(str(tmp_path / "admitted"))
    assert admitted.count() == out["admitted"]
    # updated registry holds at least the day-0 fingerprints plus fresh ones
    v1 = spark.read.parquet(str(tmp_path / "registry_fp")).count()
    v2 = spark.read.parquet(str(tmp_path / "registry_fp_v2")).count()
    assert v2 == v1 + out["fresh_after_exact"]


def test_incremental_ingest_null_fingerprint_routes_to_registry_join(
    spark, tmp_path
):
    """A NULL fingerprint (null/absent text) must NEVER ride the
    provably-new fast path: the bloom screen's bit test is NULL for a
    null item, and the fix coalesces that to maybe-present, so the doc
    pays the registry anti-join like any other uncertain item. This
    exercises the NULL route end-to-end through the example's actual
    day-1 screen (the round-trip test's corpus has no null text)."""
    from examples.incremental_ingest import _BLOOM_K, _BLOOM_M, main
    from pyspark.sql import functions as F

    from financial_data_engineering_spark.functions import text as tx
    from financial_data_engineering_spark.llm import dedup as dd
    from financial_data_engineering_spark.operators.bloom import bloom_screen
    from financial_data_engineering_spark.tables import load

    main(sf_dir="/root/testdata/sf0.001", output_dir=str(tmp_path))
    docs = load(spark, "documents", "/root/testdata/sf0.001")
    null_doc = spark.createDataFrame(
        [(999_999_999, None, None, "null-src", None)], docs.schema
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(null_doc)
    batch_fp = batch.withColumn("fp", tx.fingerprint(F.col("text")))
    screened = bloom_screen(
        batch_fp,
        spark.read.parquet(str(tmp_path / "registry_bloom")),
        "fp",
        m_words=_BLOOM_M,
        k_hashes=_BLOOM_K,
    )
    # the null-fp doc lands in the maybe slice (registry-join slice) ...
    maybe = screened.filter(F.col("maybe_present"))
    assert maybe.filter(F.col("doc_id") == 999_999_999).count() == 1
    assert (
        screened.filter(~F.col("maybe_present"))
        .filter(F.col("fp").isNull())
        .count()
        == 0
    )
    # ... and the exact screen keeps it (no registry fp is NULL, and the
    # anti-join must not silently drop the row)
    fresh_maybe, _ = dd.incremental_exact_dedup(
        maybe.drop("maybe_present"),
        spark.read.parquet(str(tmp_path / "registry_fp")),
        fingerprint_col=F.col("fp"),
    )
    assert fresh_maybe.filter(F.col("doc_id") == 999_999_999).count() == 1


def test_telemetry_monitoring_pipeline(spark, tmp_path):
    from examples.telemetry_monitoring_pipeline import main

    out = main(output_dir=str(tmp_path))
    assert out["n_events"] > 0
    # LOCF output covers at least every observed (user, day)
    assert out["n_series_rows"] >= out["n_events"] / 100
    assert out["n_transition_pairs"] > 0
    assert 0 < out["n_heavy_hitters"] <= 16
    assert out["heavy_hitter_bound_violations"] == 0
    # quantile-sketch monitoring: three estimates, ordered, with a
    # non-trivial self-certified bound
    q = out["value_quantiles_e"]
    assert set(q) == {5000, 9000, 9900}
    assert q[5000] <= q[9000] <= q[9900]
    assert 0 <= out["quantile_err_bound"] < out["quantile_n"] / 2
    # clustered landing zone exists alongside the partitioned series
    import glob

    assert glob.glob(f"{tmp_path}/events_clustered/*.parquet")
    assert glob.glob(f"{tmp_path}/daily_series/day=*/")


def test_market_bars_pipeline(spark, tmp_path):
    from examples.market_bars_pipeline import main

    out = main(output_dir=str(tmp_path))
    assert out["n_ticks"] > 0
    assert out["n_bars"] > 0
    # OHLC invariant: low <= open, close <= high on every bar
    assert out["bars_ohlc_violations"] == 0
    # VWAP is a qty-weighted mean of prices, so 0 < vwap <= brand peak
    assert out["n_brands"] == 25
    # every brand's market var is positive at this SF -> beta defined
    assert out["null_betas"] == 0
    # a brand with underwater runs must have drawn down
    assert out["uw_runs_without_drawdown"] == 0
    assert out["vwap_out_of_band"] == 0
    assert out["negative_drawdowns"] == 0
    import glob

    assert glob.glob(f"{tmp_path}/ticks_clustered/*.parquet")
    assert glob.glob(f"{tmp_path}/bars_monthly/bar_month=*/")
    assert glob.glob(f"{tmp_path}/brand_report/*.parquet")


def test_hybrid_retrieval_pipeline(spark, tmp_path):
    from examples.hybrid_retrieval_pipeline import FUSED_K, main

    out = main(output_dir=str(tmp_path))
    assert out["n_survivors"] > 0
    assert out["n_survivors"] <= out["n_docs"]
    assert out["n_bm25_hits"] > 0
    assert out["n_dense_hits"] > 0
    assert out["n_fused"] == FUSED_K
    # PRF centers the dense query on lexical hits, so the two lists
    # must overlap somewhere in the fused top-k
    assert out["n_in_both_lists"] > 0
    assert out["fused_ranks_contiguous"]
    import glob

    assert glob.glob(f"{tmp_path}/fused_hits/*.parquet")


def test_stream_rest_source_replay_properties(spark, tmp_path):
    """The streaming REST example's three pinned properties: capped
    drain of the seed rows, exactly-once tail pickup (including the
    mid-page append), and a checkpoint restart that re-emits nothing."""
    from examples.stream_rest_source import main

    out = main(spark=spark, checkpoint_dir=str(tmp_path / "ckpt"))
    assert out["first_run"] == [1, 2, 3, 4, 5]
    assert out["appended_run"] == [6, 7]  # item 6 landed on a consumed page
    assert out["resumed"] == []  # restart floor: nothing re-emitted


def test_stream_rest_source_example(spark, tmp_path):
    """Smoke the streaming REST example end-to-end (drain, tail pickup,
    checkpoint resume) so the monotone-offset restart contract has
    example-level regression coverage too, not just connector tests."""
    from examples.stream_rest_source import main

    out = main(spark=spark, checkpoint_dir=str(tmp_path / "ckpt"))
    assert out["first_run"] == [1, 2, 3, 4, 5]
    assert out["appended_run"] == [6, 7]
    assert out["resumed"] == []
