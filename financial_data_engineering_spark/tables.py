"""Table catalog: load the benchmark parquet tables with declared schemas.

``load`` applies the declared StructType so the plan's ReadSchema is exact
(column pruning + predicate pushdown reach the parquet scan), and survives
schema drift in the files themselves.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.schemas import SCHEMAS, TPCH_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as nanosecond timestamps (pandas/Arrow default). Spark's
# parquet reader has no ns TimestampType: with nanosAsLong (session.py) they
# scan as int64 and convert here — integer div, no double round-trip, so no
# precision loss at 2^62-scale epochs.
_NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one benchmark table. Declared schema, no inference."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.read
    schema = SCHEMAS.get(name)
    nanos_cols = _NANOS_TS_COLS.get(name, [])
    if schema is not None:
        if nanos_cols:
            schema = T.StructType(
                [
                    T.StructField(f.name, T.LongType() if f.name in nanos_cols else f.dataType)
                    for f in schema.fields
                ]
            )
        reader = reader.schema(schema)
    df = reader.parquet(path)
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every benchmark table into a dict."""
    return {name: load(spark, name, sf_dir) for name in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view for the SQL surface."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
