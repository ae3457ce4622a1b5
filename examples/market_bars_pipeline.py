"""End-to-end market-data bars & risk pipeline — the financial-family
example (the bar/band/drawdown surface of queries/finance.py and
operators/finance.py over the lineitem tick stream).

The reference's per-group argmax shape (reference
examples/multi_source_pipeline.py:114 — latest indicator per country)
is the kernel: open/close are argmin/argmax over an event-time total
order. This pipeline composes the full market-data stack on top:

  1. land the (brand, time)-ordered tick view RANGE-CLUSTERED by
     (brand, o) (transform/clustered.py) — per-file min/max stats become
     disjoint, so every per-brand read (bars, bands, drawdown) skips to
     its brand's files instead of scanning the corpus;
  2. monthly OHLC bars per brand (operators/finance.py ohlc_bars — ONE
     grouped aggregate, min_by/max_by partials), written partitioned by
     bar month for dashboard range reads;
  3. band monitoring two ways: the rolling Bollinger-style breach
     counter (squared-inequality int64 form) and the EWMA fixed-point
     band (the sequential recurrence, folded per brand) — both
     integer-exact, both with streaming twins
     (streaming/stateful.py running_ewma_band);
  4. risk: per-brand maximum drawdown from a running-cummax window
     (streaming twin: running_drawdown, O(1) state);
  5. the brand summary report: VWAP + bar extremes + drawdown + band
     breach counts joined into one table — every number an exact e2
     integer, every join on the 25-row brand key.

Every step is a lazy DataFrame transform; actions are the writes and
the final report counts.

Run: python examples/market_bars_pipeline.py [--sf-dir DIR] [--output DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_data_engineering_spark.operators.finance import (
    ewma_band_fold,
    ohlc_bars,
)
from financial_data_engineering_spark.queries.finance import _li_seq
from financial_data_engineering_spark.queries.registry import get
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.transform.clustered import (
    write_clustered_parquet,
)


def main(sf_dir: str = "/root/testdata/sf0.001", output_dir: str | None = None):
    spark = get_spark("market-bars-pipeline")
    output_dir = output_dir or tempfile.mkdtemp(prefix="market_bars_")

    # 1. clustered tick landing zone: (brand, o) range files
    ticks_path = os.path.join(output_dir, "ticks_clustered")
    write_clustered_parquet(
        _li_seq(spark, sf_dir), ticks_path, ["brand", "o"], num_files=8
    )
    ticks = spark.read.parquet(ticks_path)

    # 2. monthly OHLC bars, partitioned by month for range reads (the
    # month formats to string on the |bars| side only)
    bars = ohlc_bars(
        ticks, ["brand", "bar_m"], "o", "px", size_col="qty"
    ).withColumn("bar_month", F.date_format("bar_m", "yyyy-MM")).drop("bar_m")
    bars_path = os.path.join(output_dir, "bars_monthly")
    bars.write.mode("overwrite").partitionBy("bar_month").parquet(bars_path)
    bars = spark.read.parquet(bars_path)

    # 3. band monitoring: the registered queries ARE the library calls
    rolling = get("part_brand_rolling_band").fn(spark, sf_dir)
    ewma = (
        ticks.groupBy("brand")
        # flat sort elements (order fields + px): struct comparison cost
        # is per-level, see queries/finance.py _ewma_select
        .agg(
            F.collect_list(
                F.struct(
                    F.col("o.us"), F.col("o.okey"), F.col("o.lineno"), "px"
                )
            ).alias("t")
        )
        .select(
            "brand",
            F.explode(
                F.array(
                    ewma_band_fold(
                        F.transform(F.array_sort("t"), lambda s: s["px"])
                    )
                )
            ).alias("st"),
        )
        .select(
            "brand",
            F.col("st.ewma").alias("ewma_e2"),
            F.col("st.dev").alias("dev_e2"),
            (F.col("st.n_above") + F.col("st.n_below")).alias("n_breaches"),
        )
    )

    # 4. risk: max drawdown per brand
    drawdown = get("part_brand_max_drawdown").fn(spark, sf_dir)

    # 5. brand summary report — round 8 adds the bar-to-bar layer:
    # monthly close-to-close return stats, market beta, and the
    # underwater-run census (drawdown's duration counterpart)
    vwap = get("part_brand_vwap").fn(spark, sf_dir)
    beta = get("part_brand_beta").fn(spark, sf_dir)
    underwater = get("part_brand_underwater_runs").fn(spark, sf_dir)
    report = (
        vwap.join(drawdown.drop("n_ticks"), "brand")
        .join(ewma, "brand")
        .join(
            rolling.select(
                "brand",
                F.col("n_above").alias("roll_above"),
                F.col("n_below").alias("roll_below"),
            ),
            "brand",
        )
        # left: a brand with under two observed months has no return
        # series, hence no beta row — it must stay in the report with a
        # NULL beta_e4 (counted by null_betas), like underwater below
        .join(beta.select("brand", "n_months", "beta_e4"), "brand", "left")
        .join(
            underwater.select(
                "brand",
                F.col("n_runs").alias("uw_runs"),
                F.col("max_run_dur_us").alias("uw_max_dur_us"),
            ),
            "brand",
            "left",
        )
        .orderBy("brand")
    )
    report_path = os.path.join(output_dir, "brand_report")
    report.write.mode("overwrite").parquet(report_path)

    bar_rows = bars.collect()
    report_rows = report.collect()
    return {
        "n_ticks": ticks.count(),
        "n_bars": len(bar_rows),
        "bars_ohlc_violations": sum(
            1
            for b in bar_rows
            if not (
                b.low_e2 <= b.open_e2 <= b.high_e2
                and b.low_e2 <= b.close_e2 <= b.high_e2
            )
        ),
        "n_brands": len(report_rows),
        "vwap_out_of_band": sum(
            1
            for r in report_rows
            if not (0 < r.vwap_e2 <= r.peak_e2)
        ),
        "negative_drawdowns": sum(
            1 for r in report_rows if r.max_drawdown_e2 < 0
        ),
        "null_betas": sum(1 for r in report_rows if r.beta_e4 is None),
        "uw_runs_without_drawdown": sum(
            1
            for r in report_rows
            if (r.uw_runs or 0) > 0 and r.max_drawdown_e2 == 0
        ),
        "output_dir": output_dir,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    out = main(sf_dir=args.sf_dir, output_dir=args.output)
    for k, v in out.items():
        print(f"{k}: {v}")
