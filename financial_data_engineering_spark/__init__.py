"""financial_data_engineering_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``mboyajeffers/financial-data-engineering`` (see /root/reference, studied
read-only), re-expressed Spark-first: lazy DataFrames, Catalyst-optimized
plans, StructType schemas, aggregate-fused quality rules, and
Structured Streaming for event data.

Nothing in here is a port: the reference is an eager single-process pandas
ETL framework; this package declares logical plans with the DataFrame/SQL
API and lets Catalyst + Tungsten pick physical strategies, scaling from
local test data to cluster-sized inputs by construction.
"""

from financial_data_engineering_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
