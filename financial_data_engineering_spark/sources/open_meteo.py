"""Open-Meteo historical weather client: per-location archive fetch +
parallel-array pivot.

Parity with /root/reference/src/extractors/open_meteo.py:27-136. Each
location's response carries ``daily`` as parallel arrays (time[i] lines up
with each variable[i]); the pivot to rows is the classic
``arrays_zip`` + ``explode`` plan — no Python loop touches the data. A
variable missing from the response becomes a NULL column for every day
(the ``daily.get(var, [None]*n)`` analog, via coalesce with a
NULL-repeated array). Locations are unioned with ``unionByName``.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.result import ExtractionResult

#: API variable → output column (open_meteo.py:117-124).
COLUMN_MAP = {
    "temperature_2m_max": "temperature_max",
    "temperature_2m_min": "temperature_min",
    "precipitation_sum": "precipitation",
    "wind_speed_10m_max": "wind_speed_max",
}

DEFAULT_VARIABLES = list(COLUMN_MAP)

DEFAULT_LOCATIONS = [
    (40.71, -74.01, "New York"),
    (51.51, -0.13, "London"),
    (35.68, 139.69, "Tokyo"),
]


def _daily_schema(variables: list[str]) -> T.StructType:
    fields = [T.StructField("time", T.ArrayType(T.StringType()))]
    fields += [
        T.StructField(v, T.ArrayType(T.DoubleType())) for v in variables
    ]
    return T.StructType([T.StructField("daily", T.StructType(fields))])


class OpenMeteoClient(BaseClient):
    """Daily weather history from the Open-Meteo archive API
    (open_meteo.py:27-48)."""

    source_name = "open_meteo"
    base_url = "https://archive-api.open-meteo.com/v1"
    rate_limit = 60

    def extract(
        self,
        locations: list[tuple[float, float, str]] | None = None,
        start_date: str = "2024-01-01",
        end_date: str = "2024-12-31",
        variables: list[str] | None = None,
        **kwargs,
    ) -> ExtractionResult:
        """One archive request per location (requested variables are the
        projection pushdown — only named arrays come back), pivoted and
        unioned. At real volume, fan the location list out with
        ``parallelize(locations).mapPartitions(fetch)`` instead of this
        sequential loop (SURVEY.md §2.A6)."""
        started = datetime.now(timezone.utc)
        self.reset_telemetry()
        locations = DEFAULT_LOCATIONS if locations is None else locations
        variables = DEFAULT_VARIABLES if variables is None else variables
        try:
            frames = [
                self._fetch_location(lat, lon, name, start_date, end_date, variables)
                for lat, lon, name in locations
            ]
            frames = [f for f in frames if f is not None]
            if not frames:
                combined = self.spark.createDataFrame([], self._out_schema(variables))
            else:
                combined = reduce(DataFrame.unionByName, frames)
            return self._build_result(combined, started)
        except Exception as exc:  # noqa: BLE001 — lifecycle contract: never raise
            return self._build_error(str(exc), started)

    def _out_schema(self, variables: list[str]) -> T.StructType:
        fields = [
            T.StructField("location", T.StringType()),
            T.StructField("date", T.TimestampType()),
        ]
        fields += [
            T.StructField(COLUMN_MAP.get(v, v), T.DoubleType()) for v in variables
        ]
        return T.StructType(fields)

    def _fetch_location(
        self,
        lat: float,
        lon: float,
        name: str,
        start_date: str,
        end_date: str,
        variables: list[str],
    ) -> DataFrame | None:
        """Fetch one location and pivot its parallel arrays to rows
        (open_meteo.py:95-136 semantics). Returns None when the response
        has no usable ``daily.time`` axis."""
        payload = self._get(
            "/archive",
            params={
                "latitude": lat,
                "longitude": lon,
                "start_date": start_date,
                "end_date": end_date,
                "daily": ",".join(variables),
                "timezone": "UTC",
            },
        )
        daily = payload.get("daily") or {}
        if "time" not in daily:
            return None
        df = self.json_to_df([json.dumps(payload)], _daily_schema(variables))
        time_axis = F.col("daily.time")
        null_axis = F.transform(time_axis, lambda _: F.lit(None).cast("double"))
        zipped = F.arrays_zip(
            time_axis.alias("t"),
            *[
                F.coalesce(F.col(f"daily.{v}"), null_axis).alias(v)
                for v in variables
            ],
        )
        return df.select(F.explode(zipped).alias("z")).select(
            F.lit(name).alias("location"),
            F.to_timestamp(F.col("z.t")).alias("date"),
            *[F.col(f"z.{v}").alias(COLUMN_MAP.get(v, v)) for v in variables],
        )
