"""Dimensional-modelling queries (SURVEY.md §2.J) with DuckDB oracles:
date dimension, byte-compatible MD5 surrogate keys, fact-table key
resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.functions.keys import date_key, surrogate_key
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load
from financial_data_engineering_spark.transform.date_dim import build_date_dimension


@register(
    "date_dimension",
    oracle="""
    SELECT CAST(strftime(d, '%Y%m%d') AS INT) AS date_key,
           d AS date,
           year(d) AS year,
           quarter(d) AS quarter,
           month(d) AS month,
           monthname(d) AS month_name,
           dayname(d) AS day_of_week,
           dayofyear(d) AS day_of_year,
           isodow(d) IN (6, 7) AS is_weekend
    FROM (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
    ORDER BY date_key
    """,
)
def date_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date dimension (J3): distinct order dates → nine calendar attributes,
    all in one distinct+project plan (reference loops rows in Python,
    base_transformer.py:63-80). Includes the weekday-numbering parity trap:
    Spark dayofweek IN (1,7) == python weekday() >= 5."""
    return build_date_dimension(load(spark, "orders", sf_dir), "o_orderdate")


@register(
    "surrogate_keys_nation",
    oracle="""
    SELECT n_nationkey, n_name,
           substring(md5(concat_ws('|', n_name, CAST(n_nationkey AS VARCHAR))), 1, 12)
               AS nation_sk
    FROM nation
    ORDER BY n_nationkey
    """,
)
def surrogate_keys_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate keys (J1/H1): 12-hex-char MD5 over '|'-joined natural key,
    byte-compatible with the reference scheme (base_transformer.py:53-56)
    so keys survive a migration. Pure expression — verified here against
    an independent MD5 implementation (DuckDB's)."""
    nation = load(spark, "nation", sf_dir)
    return nation.select(
        "n_nationkey",
        "n_name",
        surrogate_key(F.col("n_name"), F.col("n_nationkey")).alias("nation_sk"),
    ).orderBy("n_nationkey")


@register(
    "fact_orders_star",
    oracle="""
    SELECT o_orderkey,
           CAST(strftime(CAST(o_orderdate AS DATE), '%Y%m%d') AS INT) AS date_key,
           substring(md5(concat_ws('|', c_name, CAST(c_custkey AS VARCHAR))), 1, 12)
               AS customer_sk,
           round(o_totalprice, 2) AS totalprice
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_orderkey
    """,
)
def fact_orders_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact build with FK resolution (J5/C4): orders joined to the customer
    dimension (broadcast — the fact side never shuffles) picking up the
    dimension's surrogate key plus the yyyyMMdd date key facts partition by."""
    orders = load(spark, "orders", sf_dir)
    customer = load(spark, "customer", sf_dir)
    dim_customer = customer.select(
        "c_custkey",
        surrogate_key(F.col("c_name"), F.col("c_custkey")).alias("customer_sk"),
    )
    return (
        orders.join(F.broadcast(dim_customer), orders.o_custkey == dim_customer.c_custkey)
        .select(
            "o_orderkey",
            date_key(F.col("o_orderdate")).alias("date_key"),
            "customer_sk",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
        .orderBy("o_orderkey")
    )
