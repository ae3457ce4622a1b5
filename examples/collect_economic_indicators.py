"""Economic indicator collection — re-creates
/root/reference/examples/collect_economic_indicators.py:1-80 Spark-first.

Shape coverage: page-number pagination (A5), drop-null filter (B3),
latest-value-per-country window argmax (D2), full sort desc (F2).
Offline by default; ``--live`` hits the real World Bank API.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import argmax_per_group
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.sources import WorldBankClient

_PAGE = [
    {"page": 1, "pages": 1, "per_page": 100, "total": 10},
    [
        {"indicator": {"id": ind, "value": label},
         "country": {"id": cid, "value": cname},
         "countryiso3code": iso3, "date": str(year), "value": val}
        for (ind, label) in [("NY.GDP.PCAP.CD", "GDP per capita"),
                             ("SP.POP.TOTL", "Population")]
        for (cid, iso3, cname) in [("US", "USA", "United States"),
                                   ("DE", "DEU", "Germany"),
                                   ("JP", "JPN", "Japan")]
        for (year, val) in [(2022, 50000.0), (2023, 52000.0), (2021, None)]
    ],
]


class OfflineWorldBank(WorldBankClient):
    def _get(self, path, params=None, **kwargs):
        return _PAGE


def main(live: bool = False) -> dict:
    spark = get_spark("collect-economic-indicators")
    client = (WorldBankClient if live else OfflineWorldBank)(spark)
    result = client.extract()
    if not result.success:
        raise SystemExit(f"extraction failed: {result.error}")
    df = result.data
    print(f"Collected {result.records} indicator rows")

    latest = argmax_per_group(
        df.na.drop(subset=["value"]),
        ["country_code", "indicator_code"],
        "year",
    ).orderBy(F.desc("value"))

    print("\nLatest values (desc):")
    for r in latest.collect():
        print(f"  {r['country_name']:<16} {r['indicator_name']:<16} "
              f"{r['year']}  {r['value']:,.0f}")
    return {"result": result, "latest": latest}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--live", action="store_true")
    main(ap.parse_args().live)
