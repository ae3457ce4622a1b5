"""Transformer lifecycle: abstract transform + result envelope + parquet sink.

Mirrors the reference's transformer contract (base_transformer.py:18-93):
``transform(raw_tables) -> TransformationResult`` with per-table row counts,
output paths, and duration — but tables are Spark DataFrames and sinks are
``df.write.parquet`` (snappy is Spark's parquet default). Facts support
partitioned writes so downstream scans prune by partition column.
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame


@dataclass
class TransformationResult:
    """Control-plane envelope for a transform run."""

    success: bool
    tables: dict[str, DataFrame] = field(default_factory=dict)
    rows_by_table: dict[str, int] = field(default_factory=dict)
    output_paths: dict[str, str] = field(default_factory=dict)
    duration_seconds: float = 0.0
    error: str | None = None
    metadata: dict[str, Any] = field(default_factory=dict)


class BaseTransformer(ABC):
    """Abstract transformer with a table registry and parquet sink."""

    def __init__(self, output_dir: str | None = None):
        self.output_dir = output_dir
        self._tables: dict[str, DataFrame] = {}

    @abstractmethod
    def transform(self, raw: dict[str, DataFrame]) -> TransformationResult:
        """Turn raw source tables into modelled output tables."""

    def register_table(self, name: str, df: DataFrame) -> None:
        self._tables[name] = df
        df.createOrReplaceTempView(name)

    def get_table(self, name: str) -> DataFrame:
        return self._tables[name]

    def get_all_tables(self) -> dict[str, DataFrame]:
        return dict(self._tables)

    def save_table(
        self,
        name: str,
        df: DataFrame,
        path: str,
        partition_by: list[str] | None = None,
    ) -> str:
        """Write snappy parquet, optionally hive-partitioned (facts by
        date_key so time-range scans prune files)."""
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        self.register_table(name, df)
        return path

    @staticmethod
    def timed(fn, *args, **kwargs) -> tuple[Any, float]:
        start = time.perf_counter()
        out = fn(*args, **kwargs)
        return out, time.perf_counter() - start
