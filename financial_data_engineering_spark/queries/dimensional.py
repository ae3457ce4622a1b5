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


@register(
    "customer_priority_scd2",
    oracle="""
    WITH ordered AS (
        SELECT o_custkey AS customer_id,
               o_orderpriority AS priority,
               o_orderdate AS observed_at,
               o_orderkey AS tie,
               CASE WHEN o_orderpriority IS DISTINCT FROM
                         lag(o_orderpriority) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
        SELECT *, sum(chg) OVER (PARTITION BY customer_id
                                 ORDER BY observed_at, tie
                                 ROWS UNBOUNDED PRECEDING) AS version
        FROM ordered
    ),
    versions AS (
        SELECT customer_id, priority, version,
               min(observed_at) AS valid_from,
               count(*) AS n_observations
        FROM runs
        GROUP BY customer_id, priority, version
    )
    SELECT customer_id,
           CAST(version AS BIGINT) AS version,
           priority,
           valid_from,
           lead(valid_from) OVER v AS valid_to,
           CAST(CASE WHEN lead(valid_from) OVER v IS NULL
                     THEN 1 ELSE 0 END AS BIGINT) AS is_current,
           n_observations
    FROM versions
    WINDOW v AS (PARTITION BY customer_id ORDER BY version)
    ORDER BY customer_id, version
    """,
)
def customer_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension (J-family extension; the reference
    stops at type-1 overwrite loads): each customer's order-priority
    observations collapse into versioned validity intervals via
    transform.scd2_from_observations — half-open [valid_from, valid_to)
    rows an as-of probe can join exactly one of. The oracle replays the
    identical gaps-and-islands derivation in SQL; the Spark plan does the
    whole build in ONE data shuffle (every window/group clusters on the
    customer key)."""
    from financial_data_engineering_spark.transform import scd2_from_observations

    orders = load(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
        "o_orderkey",
    )
    return scd2_from_observations(
        orders,
        key_cols=["customer_id"],
        attr_cols=["priority"],
        ts_col="o_orderdate",
        tie_col="o_orderkey",
    ).orderBy("customer_id", "version")
