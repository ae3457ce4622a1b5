"""Orchestrator tests mirroring the reference's collector matrix
(reference: tests/test_collector.py:15-148): registration, unknown-source
KeyError, error isolation in collect_all, telemetry aggregation, and
Spark-join merge_results.
"""

from __future__ import annotations

import pytest

from financial_data_engineering_spark.pipeline import MultiSourceCollector
from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.result import ExtractionResult


class FakeClient(BaseClient):
    source_name = "fake"
    base_url = "https://fake"
    rate_limit = 60

    def __init__(self, spark, rows=(), fail=False, raise_=False):
        super().__init__(spark)
        self._rows = list(rows)
        self._fail = fail
        self._raise = raise_

    def extract(self, **kwargs):
        from datetime import datetime, timezone

        if self._raise:
            raise RuntimeError("hard failure")
        started = datetime.now(timezone.utc)
        if self._fail:
            return self._build_error("soft failure", started)
        df = self.spark.createDataFrame(self._rows, "key string, v int")
        return self._build_result(df, started)


def test_register_and_list(spark):
    c = MultiSourceCollector()
    c.register("a", FakeClient(spark))
    c.register("b", FakeClient(spark))
    assert c.list_sources() == ["a", "b"]


def test_collect_unknown_raises(spark):
    with pytest.raises(KeyError):
        MultiSourceCollector().collect("nope")


def test_collect_all_error_isolation(spark):
    c = MultiSourceCollector()
    c.register("good", FakeClient(spark, rows=[("x", 1)]))
    c.register("soft", FakeClient(spark, fail=True))
    c.register("hard", FakeClient(spark, raise_=True))
    results = c.collect_all()
    assert results["good"].success and results["good"].records == 1
    assert not results["soft"].success and "soft failure" in results["soft"].error
    assert not results["hard"].success and "hard failure" in results["hard"].error
    assert isinstance(results["hard"], ExtractionResult)


def test_collect_all_per_source_kwargs_ignored_if_not_dict(spark):
    c = MultiSourceCollector()
    c.register("good", FakeClient(spark, rows=[("x", 1)]))
    results = c.collect_all(good="not-a-dict")
    assert results["good"].success


def test_telemetry_aggregation(spark):
    c = MultiSourceCollector()
    a, b = FakeClient(spark), FakeClient(spark)
    a.api_calls, a.cache_hits, a.errors = 3, 1, 0
    b.api_calls, b.cache_hits, b.errors = 2, 0, 2
    c.register("a", a)
    c.register("b", b)
    t = c.get_telemetry()
    assert t["totals"] == {"api_calls": 5, "cache_hits": 1, "errors": 2}
    assert t["per_source"]["b"]["errors"] == 2


def test_merge_results_joins_frames(spark):
    left = spark.createDataFrame([("US", 1), ("GB", 2)], "code string, a int")
    right = spark.createDataFrame([("US", 10.0)], "iso string, b double")
    inner = MultiSourceCollector.merge_results(left, right, "code", "iso")
    assert inner.count() == 1
    outer = MultiSourceCollector.merge_results(left, right, "code", "iso", "left")
    assert outer.count() == 2
