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

    #: below this many remaining pages, a Spark job costs more than the
    #: driver loop it replaces; above it, pages 2..N are a known request
    #: set and fan out per SURVEY §2.A5.
    FANOUT_MIN_PAGES = 8
    #: ceiling on concurrent fetch tasks, so the per-task token budget
    #: (rate_limit / tasks) stays meaningful.
    FANOUT_MAX_TASKS = 8

    def _fetch_indicator(
        self, country_str: str, indicator: str, start_year: int, end_year: int
    ) -> list[dict]:
        """Page-number pagination (world_bank.py:88-125): page count comes
        from page 1's metadata; malformed envelopes or null data stop the
        walk. Page 1 always fetches on the driver (its metadata IS the
        request-set discovery); when the remaining page set is large it
        fans out across executors, otherwise the driver walks it."""
        path = f"/country/{country_str}/indicator/{indicator}"
        base_params = {
            "format": "json",
            "date": f"{start_year}:{end_year}",
            "per_page": self.PER_PAGE,
        }
        raw = self._get(path, params={**base_params, "page": 1})
        if not isinstance(raw, list) or len(raw) < 2 or raw[1] is None:
            return []
        metadata, data = raw[0], raw[1]
        records: list[dict] = list(data)
        pages = (metadata or {}).get("pages", 1)
        if pages <= 1:
            return records
        if pages - 1 < self.FANOUT_MIN_PAGES:
            for page in range(2, pages + 1):
                raw = self._get(path, params={**base_params, "page": page})
                if not isinstance(raw, list) or len(raw) < 2 or raw[1] is None:
                    break
                records.extend(raw[1])
            return records
        records.extend(self._fanout_pages(path, base_params, range(2, pages + 1)))
        return records

    def _fanout_pages(
        self, path: str, base_params: dict, pages: range
    ) -> list[dict]:
        """Distributed page fetch: ``parallelize(pages).mapPartitions`` —
        the SURVEY §2.A5 mapping for known-page-count pagination. Each task
        opens its own HTTP session and self-throttles to its share of the
        global rate limit (rate_limit / n_tasks), so the aggregate request
        rate honours the API quota without driver coordination. Malformed
        pages are skipped (the driver walk's stop-on-malformed semantics
        don't compose with unordered tasks); results return to the driver
        as plain records, entering the data plane through json_to_df like
        every other page."""
        n_slices = max(1, min(len(pages), self.FANOUT_MAX_TASKS))
        delay_s = 60.0 * n_slices / self.rate_limit
        fetch = self._page_fetcher(
            f"{self.base_url}{path}",
            dict(base_params),
            dict(self._session.headers),
            delay_s,
        )
        self.last_fanout_partitions = n_slices
        rows = (
            self.spark.sparkContext.parallelize(list(pages), n_slices)
            .mapPartitions(fetch)
            .collect()
        )
        self.api_calls += len(pages)
        return rows

    @staticmethod
    def _page_fetcher(url: str, base_params: dict, headers: dict, delay_s: float):
        """Executor-side fetch closure. Deliberately self-free: it closes
        only over plain values, so cloudpickle ships it by value and no
        driver state (session, token bucket, telemetry) is captured."""

        def fetch(pages_iter):
            import time as _time

            import requests as rq

            sess = rq.Session()
            sess.headers.update(headers)
            out: list[dict] = []
            first = True
            for page in pages_iter:
                if not first:
                    _time.sleep(delay_s)
                first = False
                for attempt in range(4):
                    try:
                        resp = sess.get(
                            url, params={**base_params, "page": page}, timeout=30
                        )
                    except rq.ConnectionError:
                        _time.sleep(2**attempt)
                        continue
                    if resp.status_code == 429:
                        _time.sleep(int(resp.headers.get("Retry-After", 5)))
                        continue
                    resp.raise_for_status()
                    payload = resp.json()
                    if (
                        isinstance(payload, list)
                        and len(payload) >= 2
                        and payload[1]
                    ):
                        out.extend(payload[1])
                    break
            return iter(out)

        return fetch

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
