"""End-to-end multi-source pipeline — the engine's flagship example,
re-creating /root/reference/examples/multi_source_pipeline.py:1-176 with
Spark-native fusion (joins instead of driver-side dict probes).

Flow:
  1. collect economic indicators + weather from two clients
     (offline by default: canned payloads stand in for the live APIs, so
     the example runs hermetically; pass ``--live`` for real HTTP);
  2. fuse: latest GDP/population per country (window argmax, D2) joined
     with average temperature per capital (broadcast join, C3);
  3. quality-gate the fused frame (completeness + range rules compiled to
     one aggregate pass);
  4. build a star schema (dim_country + fact_country_indicators) and write
     parquet.

Run: python examples/multi_source_pipeline.py [--output DIR] [--live]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_data_engineering_spark.functions import surrogate_key
from financial_data_engineering_spark.operators import argmax_per_group
from financial_data_engineering_spark.pipeline import MultiSourceCollector
from financial_data_engineering_spark.quality import (
    CompletenessRule,
    DataValidator,
    RangeRule,
)
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.sources import OpenMeteoClient, WorldBankClient
from financial_data_engineering_spark.transform import StarSchemaBuilder

# --- Offline fixtures (stand-ins for the live APIs) -------------------------

_WB_PAGE = [
    {"page": 1, "pages": 1, "per_page": 100, "total": 6},
    [
        {"indicator": {"id": ind, "value": label}, "country": {"id": cid, "value": cname},
         "countryiso3code": iso3, "date": str(year), "value": value}
        for (ind, label) in [
            ("NY.GDP.PCAP.CD", "GDP per capita"),
            ("SP.POP.TOTL", "Population"),
        ]
        for (cid, iso3, cname, year, value) in [
            ("US", "USA", "United States", 2022, 76329.6 if ind == "NY.GDP.PCAP.CD" else 333287557.0),
            ("US", "USA", "United States", 2023, 80034.6 if ind == "NY.GDP.PCAP.CD" else 334914895.0),
            ("GB", "GBR", "United Kingdom", 2023, 48913.2 if ind == "NY.GDP.PCAP.CD" else 68350000.0),
            ("JP", "JPN", "Japan", 2023, 33950.8 if ind == "NY.GDP.PCAP.CD" else 124516650.0),
        ]
    ],
]

_WEATHER = {
    "New York": {"daily": {"time": ["2024-01-01", "2024-01-02"],
                           "temperature_2m_max": [5.2, 3.8],
                           "temperature_2m_min": [-1.0, -2.5],
                           "precipitation_sum": [0.0, 12.5],
                           "wind_speed_10m_max": [15.3, 22.1]}},
    "London": {"daily": {"time": ["2024-01-01", "2024-01-02"],
                         "temperature_2m_max": [9.1, 8.4],
                         "temperature_2m_min": [3.2, 2.8],
                         "precipitation_sum": [4.1, 0.2],
                         "wind_speed_10m_max": [30.5, 18.9]}},
    "Tokyo": {"daily": {"time": ["2024-01-01", "2024-01-02"],
                        "temperature_2m_max": [12.3, 11.0],
                        "temperature_2m_min": [4.5, 3.9],
                        "precipitation_sum": [0.0, 0.0],
                        "wind_speed_10m_max": [10.2, 14.4]}},
}

#: capital city → its country's ISO3 (the fusion join key bridge).
_CITY_TO_ISO3 = {"New York": "USA", "London": "GBR", "Tokyo": "JPN"}


class OfflineWorldBank(WorldBankClient):
    """WorldBankClient with the HTTP hop replaced by a canned page."""

    def _get(self, path, params=None, **kwargs):
        return _WB_PAGE


class OfflineOpenMeteo(OpenMeteoClient):
    """OpenMeteoClient with the HTTP hop replaced by canned payloads,
    keyed by the location the extract loop is currently fetching."""

    def extract(self, locations=None, **kwargs):
        self._locations = locations or [
            (40.71, -74.01, "New York"),
            (51.51, -0.13, "London"),
            (35.68, 139.69, "Tokyo"),
        ]
        return super().extract(locations=self._locations, **kwargs)

    def _get(self, path, params=None, **kwargs):
        for lat, lon, name in self._locations:
            if abs(params["latitude"] - lat) < 1e-9:
                return _WEATHER.get(name, {"daily": {}})
        return {"daily": {}}


def main(output_dir: str | None = None, live: bool = False) -> dict:
    spark = get_spark("multi-source-pipeline")
    output_dir = output_dir or tempfile.mkdtemp(prefix="fde_spark_example_")

    # 1. Collect (error-isolated; one source failing would not stop the other).
    collector = MultiSourceCollector()
    collector.register(
        "world_bank", (WorldBankClient if live else OfflineWorldBank)(spark)
    )
    collector.register(
        "open_meteo", (OpenMeteoClient if live else OfflineOpenMeteo)(spark)
    )
    results = collector.collect_all()
    for name, res in results.items():
        status = "ok" if res.success else f"FAILED: {res.error}"
        print(f"  {name}: {res.records} records [{status}]")
    if not all(r.success for r in results.values()):
        raise SystemExit("extraction failed")

    wb = results["world_bank"].data
    weather = results["open_meteo"].data

    # 2. Fuse. Latest value per (country, indicator) = window argmax on year
    #    (multi_source_pipeline.py:114,120's idxmax, as row_number over a
    #    window). Weather rolls up per city, bridges to ISO3, broadcasts.
    latest = argmax_per_group(
        wb.filter(F.col("value").isNotNull()),
        ["country_code", "indicator_code"],
        "year",
    )
    gdp = latest.filter(F.col("indicator_code") == "NY.GDP.PCAP.CD").select(
        "country_code", "country_name", F.col("value").alias("gdp_per_capita")
    )
    pop = latest.filter(F.col("indicator_code") == "SP.POP.TOTL").select(
        "country_code", F.col("value").alias("population")
    )
    city_map = F.create_map(
        *[F.lit(x) for kv in _CITY_TO_ISO3.items() for x in kv]
    )
    avg_temp = (
        weather.withColumn("country_code", city_map[F.col("location")])
        .groupBy("country_code")
        .agg(F.round(F.avg("temperature_max"), 2).alias("avg_temp_max"))
    )
    fused = (
        gdp.join(pop, "country_code", "left")
        .join(F.broadcast(avg_temp), "country_code", "left")
        .orderBy(F.desc("gdp_per_capita"))
    )
    print("\nCountry fusion (latest indicators + average capital temperature):")
    for row in fused.collect():
        print(
            f"  {row['country_name']:<16} gdp/cap ${row['gdp_per_capita']:>10,.0f}"
            f"  pop {row['population']:>13,.0f}  avg max temp {row['avg_temp_max']}"
        )

    # 3. Quality gate: one aggregate pass over the fused frame.
    report = (
        DataValidator("fused_countries")
        .add_rule(CompletenessRule(["country_code", "gdp_per_capita"]))
        .add_rule(RangeRule("gdp_per_capita", min_val=0, max_val=1e7))
        .validate(fused)
    )
    print(f"\nQuality: {report.pass_count}/{report.total_rules} rules passed")
    if not report.passed:
        raise SystemExit("quality gate failed")

    # 4. Star schema: country dimension + indicator fact, parquet output.
    dim_country = fused.select(
        surrogate_key("country_code").alias("country_sk"),
        "country_code",
        "country_name",
    )
    fact = (
        fused.join(dim_country, "country_code")
        .select(
            "country_sk",
            "gdp_per_capita",
            "population",
            "avg_temp_max",
        )
    )
    builder = (
        StarSchemaBuilder("economic", output_dir)
        .add_dimension("dim_country", natural_keys=["country_code"])
        .add_fact(
            "fact_country_indicators",
            measures=["gdp_per_capita", "population", "avg_temp_max"],
            dimension_keys=["country_sk"],
        )
    )
    build = builder.build(
        {"dim_country": dim_country, "fact_country_indicators": fact}
    )
    print(f"\nStar schema written to {output_dir}: {build.rows_by_table}")
    orphans = builder.validate_referential_integrity()
    print(f"Referential integrity orphans: {orphans}")
    return {
        "orphans": orphans,
        "results": results,
        "fused_rows": fused.count(),
        "report": report,
        "build": build,
        "output_dir": output_dir,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default=None)
    ap.add_argument("--live", action="store_true", help="hit the real APIs")
    args = ap.parse_args()
    main(args.output, args.live)
