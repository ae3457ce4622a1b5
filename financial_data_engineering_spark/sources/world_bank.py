"""World Bank indicator client: page-number pagination + envelope unwrap +
record normalization.

Parity with /root/reference/src/extractors/world_bank.py:30-155. The API
returns ``[metadata, data]`` per page; the driver loop reads
``metadata.pages`` after page 1 and walks the rest (at volume, pages 2..N
are a known request set — fan them out via ``parallelize``). Record
flattening is expression-level: ``coalesce(countryiso3code, country.id)``
for the code fallback, ``try_cast`` for the year parse and numeric coerce
(invalid → NULL — pandas ``errors='coerce'`` semantics under ANSI mode).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.result import ExtractionResult

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("countryiso3code", T.StringType()),
        T.StructField(
            "country",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "indicator",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
        ),
        T.StructField("date", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("country_code", T.StringType()),
        T.StructField("country_name", T.StringType()),
        T.StructField("indicator_code", T.StringType()),
        T.StructField("indicator_name", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)


class WorldBankClient(BaseClient):
    """Development indicators from the World Bank API
    (world_bank.py:30-44)."""

    source_name = "world_bank"
    base_url = "https://api.worldbank.org/v2"
    rate_limit = 60

    PER_PAGE = 100

    DEFAULT_COUNTRIES = ["US", "CN", "JP", "DE", "GB"]
    DEFAULT_INDICATORS = ["NY.GDP.PCAP.CD", "SP.POP.TOTL"]

    def extract(
        self,
        countries: list[str] | None = None,
        indicators: list[str] | None = None,
        start_year: int = 2018,
        end_year: int = 2023,
        **kwargs,
    ) -> ExtractionResult:
        """One paginated walk per indicator (date range pushed into the
        request), all unioned into one frame (world_bank.py:65-84)."""
        started = datetime.now(timezone.utc)
        self.reset_telemetry()
        countries = self.DEFAULT_COUNTRIES if countries is None else countries
        indicators = self.DEFAULT_INDICATORS if indicators is None else indicators
        try:
            records: list[dict] = []
            country_str = ";".join(countries)
            for indicator in indicators:
                records.extend(
                    self._fetch_indicator(country_str, indicator, start_year, end_year)
                )
            return self._build_result(self._to_df(records), started)
        except Exception as exc:  # noqa: BLE001 — lifecycle contract: never raise
            return self._build_error(str(exc), started)

    def _fetch_indicator(
        self, country_str: str, indicator: str, start_year: int, end_year: int
    ) -> list[dict]:
        """Page-number pagination (world_bank.py:88-125): page count comes
        from page 1's metadata; malformed envelopes or null data stop the
        walk."""
        records: list[dict] = []
        page = 1
        while True:
            raw = self._get(
                f"/country/{country_str}/indicator/{indicator}",
                params={
                    "format": "json",
                    "date": f"{start_year}:{end_year}",
                    "per_page": self.PER_PAGE,
                    "page": page,
                },
            )
            if not isinstance(raw, list) or len(raw) < 2:
                break
            metadata, data = raw[0], raw[1]
            if data is None:
                break
            records.extend(data)
            if page >= (metadata or {}).get("pages", 1):
                break
            page += 1
        return records

    def _to_df(self, records: list[dict]) -> DataFrame:
        """Normalize nested records to the flat schema
        (world_bank.py:127-153 semantics)."""
        if not records:
            return self.spark.createDataFrame([], OUTPUT_SCHEMA)
        df = self.json_to_df([json.dumps(r) for r in records], RECORD_SCHEMA)
        return df.select(
            F.coalesce(F.col("countryiso3code"), F.col("country.id")).alias(
                "country_code"
            ),
            F.col("country.value").alias("country_name"),
            F.col("indicator.id").alias("indicator_code"),
            F.col("indicator.value").alias("indicator_name"),
            F.expr("try_cast(date AS int)").alias("year"),
            F.expr("try_cast(value AS double)").alias("value"),
        )
