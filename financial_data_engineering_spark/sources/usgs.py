"""USGS earthquake catalog client: offset pagination + GeoJSON flatten.

Parity with /root/reference/src/extractors/usgs.py:30-136. The pagination
loop (stop on empty page, short page, or cap) is driver-side control flow;
the GeoJSON→table flatten is pure Catalyst — ``from_json`` on the feature
payloads, struct field access, ``try_element_at`` on the coordinates array
(OOB → NULL, the ``coords[i] if len(coords) > i else None`` analog), and
``timestamp_millis`` for the epoch-ms event time.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.result import ExtractionResult

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "properties",
            T.StructType(
                [
                    T.StructField("mag", T.DoubleType()),
                    T.StructField("place", T.StringType()),
                    T.StructField("time", T.LongType()),
                    T.StructField("type", T.StringType()),
                    T.StructField("status", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "geometry",
            T.StructType([T.StructField("coordinates", T.ArrayType(T.DoubleType()))]),
        ),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("magnitude", T.DoubleType()),
        T.StructField("place", T.StringType()),
        T.StructField("time", T.TimestampType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("depth", T.DoubleType()),
        T.StructField("type", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


class USGSClient(BaseClient):
    """Earthquake events from the USGS FDSN event service (usgs.py:30-37)."""

    source_name = "usgs"
    base_url = "https://earthquake.usgs.gov/fdsnws/event/1"
    rate_limit = 60

    PAGE_SIZE = 500

    def extract(
        self,
        start_date: str = "2025-01-01",
        end_date: str = "2025-12-31",
        min_magnitude: float = 4.5,
        max_results: int = 2000,
        **kwargs,
    ) -> ExtractionResult:
        """Fetch earthquakes in the window; predicates (time range,
        magnitude floor) and sort are pushed into the request parameters —
        source-level pushdown (SURVEY.md §2.B8)."""
        started = datetime.now(timezone.utc)
        self.reset_telemetry()
        try:
            features = self._paginate(start_date, end_date, min_magnitude, max_results)
            return self._build_result(self._to_df(features), started)
        except Exception as exc:  # noqa: BLE001 — lifecycle contract: never raise
            return self._build_error(str(exc), started)

    def _paginate(
        self,
        start_date: str,
        end_date: str,
        min_magnitude: float,
        max_results: int,
    ) -> list[dict]:
        """1-based offset pagination (usgs.py:72-108): stop on empty page,
        short page, or the max_results cap."""
        features: list[dict] = []
        offset = 1
        while len(features) < max_results:
            limit = min(self.PAGE_SIZE, max_results - len(features))
            page = self._get(
                "/query",
                params={
                    "format": "geojson",
                    "starttime": start_date,
                    "endtime": end_date,
                    "minmagnitude": min_magnitude,
                    "limit": limit,
                    "offset": offset,
                    "orderby": "magnitude",
                },
            )
            batch = page.get("features", [])
            if not batch:
                break
            features.extend(batch)
            offset += len(batch)
            if len(batch) < limit:
                break
        return features

    def _to_df(self, features: list[dict]):
        """GeoJSON flatten as expressions (usgs.py:110-136 semantics)."""
        if not features:
            return self.spark.createDataFrame([], OUTPUT_SCHEMA)
        df = self.json_to_df([json.dumps(f) for f in features], FEATURE_SCHEMA)
        coords = F.col("geometry.coordinates")
        return df.select(
            F.col("id"),
            F.col("properties.mag").alias("magnitude"),
            F.col("properties.place").alias("place"),
            F.timestamp_millis(F.col("properties.time")).alias("time"),
            F.try_element_at(coords, F.lit(2)).alias("latitude"),
            F.try_element_at(coords, F.lit(1)).alias("longitude"),
            F.try_element_at(coords, F.lit(3)).alias("depth"),
            F.col("properties.type").alias("type"),
            F.col("properties.status").alias("status"),
        )
