"""Earthquake collection + analysis — re-creates
/root/reference/examples/collect_earthquakes.py:1-90 Spark-first.

Shape coverage: offset-paginated extraction (A4), top-k by magnitude
(F1), region extraction + value counts (H3 + D3), depth stats incl.
median (D5). Offline by default; ``--live`` hits the real USGS API.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import topk, value_counts
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.sources import USGSClient

_OFFLINE_FEATURES = {
    "features": [
        {
            "id": f"ev{i:03d}",
            "properties": {
                "mag": 4.5 + (i * 37 % 40) / 10.0,
                "place": f"{10 + i} km W of City{i % 6}, Region {i % 4}",
                "time": 1700000000000 + i * 3_600_000,
                "type": "earthquake",
                "status": "reviewed" if i % 3 else "automatic",
            },
            "geometry": {
                "coordinates": [-120.0 + i, 30.0 + (i % 7), 5.0 + (i * 13 % 60)]
            },
        }
        for i in range(40)
    ]
}


class OfflineUSGS(USGSClient):
    def _get(self, path, params=None, **kwargs):
        return _OFFLINE_FEATURES


def main(live: bool = False) -> dict:
    spark = get_spark("collect-earthquakes")
    client = (USGSClient if live else OfflineUSGS)(spark)
    result = client.extract(min_magnitude=4.5, max_results=100)
    if not result.success:
        raise SystemExit(f"extraction failed: {result.error}")
    df = result.data
    print(f"Collected {result.records} earthquakes")

    strongest = topk(df, [F.desc("magnitude"), F.asc("id")], 10)
    print("\nStrongest:")
    for r in strongest.collect():
        print(f"  M{r['magnitude']:.1f}  {r['place']}")

    regions = value_counts(
        df.select(
            F.regexp_extract("place", r",\s*(.+)$", 1).alias("region")
        ),
        "region",
        k=10,
    )
    print("\nMost active regions:")
    for r in regions.collect():
        print(f"  {r['region']}: {r['count']}")

    depth = df.agg(
        F.round(F.avg("depth"), 1).alias("mean"),
        F.round(F.percentile_approx("depth", 0.5), 1).alias("median"),
        F.round(F.max("depth"), 1).alias("max"),
    ).collect()[0]
    print(f"\nDepth km: mean {depth['mean']}, median {depth['median']}, "
          f"max {depth['max']}")
    return {"result": result, "strongest": strongest, "depth": depth}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--live", action="store_true")
    main(ap.parse_args().live)
