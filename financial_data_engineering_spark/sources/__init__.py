"""REST extraction sources: driver-side fetch (rate-limited, cached,
retried), Catalyst-expression flattening, Spark DataFrame output."""

from financial_data_engineering_spark.sources.base_client import BaseClient
from financial_data_engineering_spark.sources.open_meteo import OpenMeteoClient
from financial_data_engineering_spark.sources.result import ExtractionResult
from financial_data_engineering_spark.sources.usgs import USGSClient
from financial_data_engineering_spark.sources.world_bank import WorldBankClient

__all__ = [
    "BaseClient",
    "ExtractionResult",
    "OpenMeteoClient",
    "USGSClient",
    "WorldBankClient",
]
