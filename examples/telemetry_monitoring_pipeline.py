"""End-to-end event-telemetry monitoring — the analytics-extension example
(time-series + sequence surface over the ``events`` table; batch twins of
the streaming operators in financial_data_engineering_spark.streaming).

Flow:
  1. land the raw events RANGE-CLUSTERED by (user_id, ts)
     (transform/clustered.py) — per-file min/max stats become disjoint,
     so every later per-user read skips to ~one file instead of scanning
     the corpus;
  2. per-user daily value series with LOCF gap repair
     (operators/timeseries.py) — the input the rolling/alerting layers
     assume is gap-free;
  3. behavioral rollups: first-order transition matrix
     (event_transition_counts' plan) and browse-to-buy sequence runs;
  4. heavy-hitter users by event volume in bounded memory
     (operators/heavyhitters.py Misra-Gries) — est/err audited against
     the exact counts, the check a monitoring path ships with — and
     value p50/p90/p99 from the self-certifying MRL quantile sketch
     (operators/quantilesketch.py);
  5. write the daily series partitioned by day for dashboard range reads.

Every step is a lazy DataFrame transform; actions are the final counts,
the audit, and the writes.

Run: python examples/telemetry_monitoring_pipeline.py [--sf-dir DIR] [--output DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import (
    misra_gries_topk,
    pattern_run_counts,
    quantile_sketch,
    sketch_quantiles,
    transition_counts,
)
from financial_data_engineering_spark.queries.events import (
    BROWSE_TO_BUY_PATTERN,
)
from financial_data_engineering_spark.operators.timeseries import locf_daily_fill
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.tables import load
from financial_data_engineering_spark.transform.clustered import (
    write_clustered_parquet,
)

HEAVY_K = 16
QSKETCH_K = 64


def main(
    sf_dir: str = "/root/testdata/sf0.001", output_dir: str | None = None
) -> dict:
    spark = get_spark("telemetry-monitoring")
    output_dir = output_dir or tempfile.mkdtemp(prefix="telemetry_")
    events = load(spark, "events", sf_dir)

    # 1. clustered landing zone: per-user timeline reads skip files
    landed = os.path.join(output_dir, "events_clustered")
    write_clustered_parquet(
        events, landed, ["user_id", "ts"], num_files=8
    )
    events = spark.read.parquet(landed)

    # 2. gap-free per-user daily value series (LOCF repair)
    daily = events.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "daily_value_e2"
        )
    )
    series = locf_daily_fill(daily, "user_id", "day", ["daily_value_e2"])

    # 3a. transition matrix (what usually follows what) — the same
    # operator the oracle-checked event_transition_counts query runs
    transitions = transition_counts(events)

    # 3b. browse-to-buy runs per user (sequence-pattern CEP), sharing
    # the pattern constant with user_browse_to_buy_runs
    runs = pattern_run_counts(events, BROWSE_TO_BUY_PATTERN)

    # 4. heavy-hitter users (bounded memory) + the est/err audit against
    # exact counts that a monitoring deployment runs on a sample cadence
    # top= truncates to a dashboard-sized view; the presence guarantee
    # holds for the full summary (the misra_gries_topk default)
    heavy = misra_gries_topk(events, "user_id", HEAVY_K, top=HEAVY_K)
    exact = events.groupBy(
        F.col("user_id").cast("string").alias("item")
    ).agg(F.count(F.lit(1)).alias("true_count"))
    audit = heavy.join(exact, "item")
    violations = audit.filter(
        (F.col("est_count") > F.col("true_count"))
        | (F.col("true_count") > F.col("est_count") + F.col("err_bound"))
    ).count()

    # 4b. value-distribution monitoring in bounded memory: the MRL
    # quantile sketch answers p50/p90/p99 from a summary that never
    # scales with the stream, and ships its own rank-error bound — the
    # same audit-or-alert contract as the Misra-Gries summary above
    qs = sketch_quantiles(
        quantile_sketch(events, "value", k=QSKETCH_K), [0.5, 0.9, 0.99]
    ).collect()
    value_quantiles = {r.q_e4: r.est_value for r in qs}
    q_err_bound = qs[0].err_bound if qs else 0
    q_n = qs[0].n if qs else 0

    # 5. daily series partitioned by day (dashboards read day ranges)
    series_path = os.path.join(output_dir, "daily_series")
    series.write.mode("overwrite").partitionBy("day").parquet(series_path)

    return {
        "n_events": events.count(),
        "n_series_rows": spark.read.parquet(series_path).count(),
        "n_gap_rows": series.filter("is_gap = 1").count(),
        "n_transition_pairs": transitions.count(),
        "n_users_with_runs": runs.filter("n_runs > 0").count(),
        "n_heavy_hitters": heavy.count(),
        "heavy_hitter_bound_violations": violations,
        "value_quantiles_e": value_quantiles,
        "quantile_err_bound": q_err_bound,
        "quantile_n": q_n,
        "output_dir": output_dir,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    out = main(args.sf_dir, args.output)
    for k, v in out.items():
        print(f"{k}: {v}")
