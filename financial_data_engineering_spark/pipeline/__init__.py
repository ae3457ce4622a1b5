"""Pipeline orchestration: multi-source collection with error isolation."""

from financial_data_engineering_spark.pipeline.orchestrator import (
    MultiSourceCollector,
)

__all__ = ["MultiSourceCollector"]
