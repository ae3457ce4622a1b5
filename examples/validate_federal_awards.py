"""Federal-awards validation pipeline — re-creates
/root/reference/examples/validate_federal_awards.py:34-180 Spark-first.

Shape coverage: POST-body search scan with server-side filter/field/
sort/limit pushdown in the request (SURVEY.md §2.A7/B8/B9/F4), rename
projection (B1), numeric coerce (B4), quality gate (I1-I3), top-k (F1),
distinct counts + global stats (D4/D5).

Offline by default (a canned response stands in for the live search
endpoint); ``--live`` posts to the real API.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.quality import (
    CompletenessRule,
    DataValidator,
    RangeRule,
    UniquenessRule,
)
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.result import ExtractionResult

#: API field → snake_case output column (validate_federal_awards.py:77-86).
RENAME = {
    "Award ID": "award_id",
    "Recipient Name": "recipient_name",
    "Award Amount": "award_amount",
    "Awarding Agency": "awarding_agency",
    "Start Date": "start_date",
    "End Date": "end_date",
    "Award Type": "award_type",
    "Description": "description",
}

RESULT_SCHEMA = T.StructType(
    [T.StructField(api_name, T.StringType()) for api_name in RENAME]
)

_OFFLINE_RESULTS = {
    "results": [
        {"Award ID": f"AW-{i:04d}", "Recipient Name": f"Contractor {i % 7}",
         "Award Amount": str(1_000_000.0 / (i + 1)), "Awarding Agency": f"Agency {i % 3}",
         "Start Date": "2024-02-01", "End Date": "2025-02-01",
         "Award Type": "A", "Description": f"contract {i}"}
        for i in range(25)
    ]
}


class AwardsClient(BaseClient):
    """USASpending search client: one POST with filters, field projection,
    and sort/limit all pushed into the request body."""

    source_name = "usaspending"
    base_url = "https://api.usaspending.gov/api/v2"
    rate_limit = 60

    def extract(self, limit: int = 500, **kwargs) -> ExtractionResult:
        started = datetime.now(timezone.utc)
        self.reset_telemetry()
        try:
            payload = {
                "filters": {
                    "time_period": [
                        {"start_date": "2024-01-01", "end_date": "2025-12-31"}
                    ],
                    "award_type_codes": ["A", "B", "C", "D"],
                },
                "fields": list(RENAME),
                "limit": limit,
                "page": 1,
                "sort": "Award Amount",
                "order": "desc",
            }
            data = self._post("/search/spending_by_award/", payload)
            results = data.get("results", [])
            df = self.json_to_df(
                [json.dumps(r) for r in results], RESULT_SCHEMA
            )
            renamed = df.select(
                *[F.col(api).alias(out) for api, out in RENAME.items()]
            ).withColumn(
                "award_amount", F.expr("try_cast(award_amount AS double)")
            )
            return self._build_result(renamed, started)
        except Exception as exc:  # noqa: BLE001 — lifecycle contract
            return self._build_error(str(exc), started)


class OfflineAwardsClient(AwardsClient):
    def _post(self, path, payload, **kwargs):
        return _OFFLINE_RESULTS


def main(live: bool = False) -> dict:
    spark = get_spark("validate-federal-awards")
    client = (AwardsClient if live else OfflineAwardsClient)(spark)
    result = client.extract(limit=500)
    if not result.success:
        raise SystemExit(f"extraction failed: {result.error}")
    df = result.data
    print(f"Fetched {result.records:,} awards")

    report = (
        DataValidator("federal_awards")
        .add_rule(CompletenessRule(["award_id", "recipient_name", "award_amount"]))
        .add_rule(UniquenessRule(["award_id"]))
        .add_rule(RangeRule("award_amount", min_val=0, max_val=1e12))
        .validate(df)
    )
    report.print_summary()

    top = df.orderBy(F.desc("award_amount"), "award_id").limit(10)
    print("\nTop awards by amount:")
    for r in top.collect():
        print(f"  {r['award_id']}: ${r['award_amount']:,.0f} -> {r['recipient_name']}")
    stats = df.agg(
        F.countDistinct("awarding_agency").alias("n_agencies"),
        F.round(F.sum("award_amount"), 2).alias("total"),
        F.round(F.percentile_approx("award_amount", 0.5), 2).alias("median"),
    ).collect()[0]
    print(f"\n{stats['n_agencies']} agencies, total ${stats['total']:,.0f}, "
          f"median ${stats['median']:,.0f}")
    return {"result": result, "report": report, "stats": stats}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--live", action="store_true")
    main(ap.parse_args().live)
