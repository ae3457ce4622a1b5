"""Multi-source extraction orchestrator.

Parity with /root/reference/src/pipeline/orchestrator.py:18-124:
registration, single/all collection with per-source error isolation,
telemetry aggregation, and result merging — with ``merge_results`` joining
Spark DataFrames (Catalyst picks broadcast/shuffled-hash/sort-merge; the
reference's pandas hash join chose for you).

Error isolation under lazy evaluation (SURVEY.md §7.3): a client's
``extract()`` already wraps its own work (including the eager ``count()``)
so most failures come back as failed results; the try/except here is the
second belt for clients that raise anyway, matching
tests/test_collector.py:68-84 behavior.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.result import ExtractionResult


class MultiSourceCollector:
    """Registry + driver loop over extraction clients
    (orchestrator.py:18-41)."""

    def __init__(self) -> None:
        self._clients: dict[str, BaseClient] = {}

    def register(self, name: str, client: BaseClient) -> None:
        self._clients[name] = client

    def list_sources(self) -> list[str]:
        return list(self._clients.keys())

    def collect(self, name: str, **kwargs) -> ExtractionResult:
        """Extract from one source; KeyError when unregistered
        (orchestrator.py:43-58)."""
        if name not in self._clients:
            raise KeyError(f"Source '{name}' is not registered")
        return self._clients[name].extract(**kwargs)

    def collect_all(self, **source_kwargs) -> dict[str, ExtractionResult]:
        """Extract from every registered source; one failure never blocks
        the others (orchestrator.py:60-88). Per-source kwargs are looked up
        by name; non-dict values are ignored."""
        results: dict[str, ExtractionResult] = {}
        for name, client in self._clients.items():
            kwargs = source_kwargs.get(name, {})
            if not isinstance(kwargs, dict):
                kwargs = {}
            try:
                results[name] = client.extract(**kwargs)
            except Exception as exc:  # noqa: BLE001 — isolation contract
                results[name] = ExtractionResult(
                    success=False, source=name, error=str(exc)
                )
        return results

    def get_telemetry(self) -> dict[str, Any]:
        """Aggregate client counters (orchestrator.py:90-102)."""
        per_source: dict[str, Any] = {}
        totals = {"api_calls": 0, "cache_hits": 0, "errors": 0}
        for name, client in self._clients.items():
            t = client.get_telemetry()
            per_source[name] = t
            totals["api_calls"] += t["api_calls"]
            totals["cache_hits"] += t["cache_hits"]
            totals["errors"] += t["errors"]
        return {"totals": totals, "per_source": per_source}

    @staticmethod
    def merge_results(
        left: DataFrame,
        right: DataFrame,
        left_on: str,
        right_on: str,
        how: str = "inner",
    ) -> DataFrame:
        """Equi-join two extraction frames (orchestrator.py:104-124).
        ``how`` ∈ inner/left/right/outer as in pandas merge; Spark picks
        the physical join strategy (small dims broadcast automatically)."""
        return left.join(right, left[left_on] == right[right_on], how)
