"""SEC company-tickers validation pipeline — re-creates
/root/reference/examples/validate_sec_filings.py:40-180 Spark-first.

Shape coverage: static-file JSON scan whose top level is a
dict-of-records ``{"0": {cik_str, ticker, title}, "1": {...}}``
(SURVEY.md §2.A8) — flattened Spark-side by reading the outer object as a
``map<string, struct>`` and exploding its values (no Python loop over
records); zero-pad cast (B7/H6); pattern/uniqueness quality gate (I2/I4).
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
    PatternRule,
    UniquenessRule,
)
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.result import ExtractionResult

RECORD = T.StructType(
    [
        T.StructField("cik_str", T.LongType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)

TICKER_MAP_SCHEMA = T.MapType(T.StringType(), RECORD)

_OFFLINE_TICKERS = {
    str(i): {"cik_str": 320193 + i, "ticker": t, "title": n}
    for i, (t, n) in enumerate(
        [
            ("AAPL", "Apple Inc."),
            ("MSFT", "Microsoft Corp"),
            ("GOOGL", "Alphabet Inc."),
            ("AMZN", "Amazon.com Inc"),
            ("NVDA", "NVIDIA Corp"),
        ]
    )
}


class SECTickersClient(BaseClient):
    """One static JSON file; the whole payload is a single map value that
    Spark explodes into rows."""

    source_name = "sec_tickers"
    base_url = "https://www.sec.gov"
    rate_limit = 10  # SEC asks for gentle crawling

    def extract(self, **kwargs) -> ExtractionResult:
        started = datetime.now(timezone.utc)
        self.reset_telemetry()
        try:
            data = self._get("/files/company_tickers.json")
            raw = self.spark.createDataFrame(
                [(json.dumps(data),)], "raw string"
            )
            df = (
                raw.select(
                    F.explode(F.from_json("raw", TICKER_MAP_SCHEMA)).alias(
                        "idx", "rec"
                    )
                )
                .select(
                    F.lpad(F.col("rec.cik_str").cast("string"), 10, "0").alias(
                        "cik"
                    ),
                    F.col("rec.ticker").alias("ticker"),
                    F.col("rec.title").alias("company_name"),
                )
            )
            return self._build_result(df, started)
        except Exception as exc:  # noqa: BLE001 — lifecycle contract
            return self._build_error(str(exc), started)


class OfflineSECClient(SECTickersClient):
    def _get(self, path, params=None, **kwargs):
        return _OFFLINE_TICKERS


def main(live: bool = False) -> dict:
    spark = get_spark("validate-sec-filings")
    client = (SECTickersClient if live else OfflineSECClient)(spark)
    result = client.extract()
    if not result.success:
        raise SystemExit(f"extraction failed: {result.error}")
    df = result.data
    print(f"Fetched {result.records:,} companies")

    report = (
        DataValidator("sec_tickers")
        .add_rule(CompletenessRule(["cik", "ticker", "company_name"]))
        .add_rule(UniquenessRule(["cik"]))
        .add_rule(PatternRule("cik", r"\d{10}"))
        .add_rule(PatternRule("ticker", r"[A-Z]{1,5}([.-][A-Z]+)?"))
        .validate(df)
    )
    report.print_summary()

    print("\nSample:")
    for r in df.orderBy("cik").limit(10).collect():
        print(f"  {r['cik']}  {r['ticker']:<6} {r['company_name']}")
    return {"result": result, "report": report}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--live", action="store_true")
    main(ap.parse_args().live)
