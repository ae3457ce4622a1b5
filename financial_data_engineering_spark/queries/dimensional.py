"""Dimensional-modelling queries (SURVEY.md §2.J) with DuckDB oracles:
date dimension, byte-compatible MD5 surrogate keys, fact-table key
resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.functions.keys import date_key, surrogate_key
from financial_data_engineering_spark.operators.asof import asof_join
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
           o_totalprice AS totalprice
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
        orders.join(dim_customer, orders.o_custkey == dim_customer.c_custkey)
        .select(
            "o_orderkey",
            date_key(F.col("o_orderdate")).alias("date_key"),
            "customer_sk",
            F.col("o_totalprice").alias("totalprice"),
        )
        .orderBy("o_orderkey")
    )


# Gaps-and-islands SCD2 derivation as DuckDB CTEs — shared by the dimension
# build oracle and the as-of probe oracle so the two can never drift.
_SCD2_VERSIONS_CTE = """
    ordered AS (
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
"""


@register(
    "customer_priority_scd2",
    oracle=f"""
    WITH {_SCD2_VERSIONS_CTE}
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


@register(
    "lineitem_priority_asof",
    oracle=f"""
    WITH {_SCD2_VERSIONS_CTE},
    dim AS (
        SELECT customer_id, priority, valid_from
        FROM (SELECT customer_id, priority, valid_from,
                     row_number() OVER (PARTITION BY customer_id, valid_from
                                        ORDER BY version DESC) AS dup_rn
              FROM versions)
        WHERE dup_rn = 1
    ),
    li AS (
        -- (l_orderkey, l_linenumber) is NOT unique in the synthetic data,
        -- so tag each lineitem ROW with a synthetic id for the rank below.
        SELECT o_custkey AS customer_id, l_shipdate, l_quantity,
               row_number() OVER () AS li_rid
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    cand AS (
        SELECT li.li_rid, li.l_quantity, d.priority,
               row_number() OVER (PARTITION BY li.li_rid
                                  ORDER BY d.valid_from DESC) AS rn
        FROM li LEFT JOIN dim d
          ON d.customer_id = li.customer_id AND d.valid_from <= li.l_shipdate
    )
    SELECT coalesce(priority, 'NONE') AS priority_at_ship,
           count(*) AS n_lineitems,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM cand WHERE rn = 1
    GROUP BY priority_at_ship
    ORDER BY priority_at_ship
    """,
)
def lineitem_priority_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The point of a type-2 dimension: probe it AS OF each fact's own
    timestamp. Every lineitem looks up the priority version its customer
    was in on the SHIP date (not today's), then the result rolls up per
    priority. Versions sharing a valid_from keep only the highest version
    (the superseded one's half-open interval is empty), making the as-of
    ordering total on both engines.

    Spark plan: the dimension builds in its one customer-keyed shuffle;
    lineitem picks up its customer via an equi-join on orderkey; the probe
    itself is operators.asof_join — union + one key-partitioned window,
    ONE shuffle, no interval blow-up join (the oracle's inequality-join +
    rank formulation would multiply candidates at scale; the union-window
    form streams). Cite: reference has no as-of surface (SURVEY §2.C)."""
    from financial_data_engineering_spark.transform import scd2_from_observations

    orders = load(spark, "orders", sf_dir)
    dim_full = scd2_from_observations(
        orders.select(
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderpriority").alias("priority"),
            "o_orderdate",
            "o_orderkey",
        ),
        key_cols=["customer_id"],
        attr_cols=["priority"],
        ts_col="o_orderdate",
        tie_col="o_orderkey",
    )
    dup_w = Window.partitionBy("customer_id", "valid_from").orderBy(
        F.desc("version")
    )
    dim = (
        dim_full.withColumn("dup_rn", F.row_number().over(dup_w))
        .filter(F.col("dup_rn") == 1)
        .select("customer_id", "priority", "valid_from")
    )
    li = (
        load(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_quantity", "l_shipdate")
        .join(
            orders.select("o_orderkey", F.col("o_custkey").alias("customer_id")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("customer_id", "l_shipdate", "l_quantity")
    )
    probed = asof_join(
        li,
        dim,
        on="customer_id",
        left_time="l_shipdate",
        right_time="valid_from",
        payload_cols=["priority"],
    )
    return (
        probed.groupBy(
            F.coalesce("priority", F.lit("NONE")).alias("priority_at_ship")
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        )
        .orderBy("priority_at_ship")
    )
