"""Core relational queries (SURVEY.md §2.B/C/D/F/G) with DuckDB oracles.

Each query exercises one or more named operators from the inventory:
joins (C1), anti-joins (C2), broadcast dim joins (C3), argmax-per-group
windows (D2), value counts (D3), distinct counts (D4), global stats (D5),
top-k (F1), unions (G1). Floating aggregates are rounded on both sides;
every LIMIT follows a total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import (
    anti_join_orphans,
    argmax_per_group,
    topk,
    union_frames,
    value_counts,
)
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                   AS sum_qty,
           round(sum(l_extendedprice), 2)                              AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                   AS avg_qty,
           round(avg(l_extendedprice), 4)                              AS avg_price,
           round(avg(l_discount), 4)                                   AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the grouped-aggregation workhorse (D1/D5).

    Plan notes for scale: partial aggregation happens map-side (hash
    aggregate before the shuffle), only |groups| rows cross the wire, and
    the shipdate filter + 7-column projection push into the parquet scan.
    """
    li = load(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           o_orderdate AS latest_orderdate, o_totalprice AS latest_totalprice
    FROM (
        SELECT o.*, row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders o
    )
    WHERE rn = 1
    """,
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-per-group (D2) — the reference's signature
    ``df.loc[df.groupby(k)[v].idxmax()]`` idiom (multi_source_pipeline.py:114)
    as a single window pass: one shuffle on the group key, no self-join."""
    orders = load(spark, "orders", sf_dir)
    latest = argmax_per_group(
        orders, ["o_custkey"], "o_orderdate", tiebreak_cols=["o_orderkey"]
    )
    return latest.select(
        "o_custkey",
        F.col("o_orderkey").alias("latest_orderkey"),
        F.col("o_orderdate").alias("latest_orderdate"),
        F.col("o_totalprice").alias("latest_totalprice"),
    )


@register(
    "top_customers_by_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim joins (C1/C3) + aggregation + top-k (F1).

    Dims (customer, nation) are broadcast — at 100 TB the orders fact never
    shuffles for these joins; only the post-aggregation top-k is ordered,
    and that is TakeOrderedAndProject (per-partition heaps, no full sort).
    """
    orders = load(spark, "orders", sf_dir)
    customer = load(spark, "customer", sf_dir)
    nation = load(spark, "nation", sf_dir)
    joined = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    agg = joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return topk(agg, [F.desc("revenue"), F.asc("c_custkey")], 20)


@register(
    "nation_latest_order_revenue",
    oracle="""
    WITH latest AS (
        SELECT o_custkey, o_totalprice, row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT n.n_name AS nation,
           count(*) AS n_customers,
           round(sum(l.o_totalprice), 2) AS latest_revenue
    FROM latest l
    JOIN customer c ON l.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.rn = 1
    GROUP BY n.n_name
    ORDER BY latest_revenue DESC, nation
    LIMIT 10
    """,
)
def nation_latest_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: latest-order-per-customer rolled up by nation — compresses
    the reference's multi-source fusion report (multi_source_pipeline.py:106-146)
    into one plan: window argmax (D2) → broadcast dim joins (C3) → group (D1)
    → deterministic top-k (F1)."""
    orders = load(spark, "orders", sf_dir)
    customer = load(spark, "customer", sf_dir)
    nation = load(spark, "nation", sf_dir)
    latest = argmax_per_group(
        orders.select("o_custkey", "o_totalprice", "o_orderdate", "o_orderkey"),
        ["o_custkey"],
        "o_orderdate",
        tiebreak_cols=["o_orderkey"],
    )
    return (
        latest.join(F.broadcast(customer), latest.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("latest_revenue"),
        )
        .orderBy(F.desc("latest_revenue"), F.asc("nation"))
        .limit(10)
    )


@register(
    "event_type_counts",
    oracle="""
    SELECT event_type, count(*) AS count
    FROM events
    GROUP BY event_type
    ORDER BY count DESC, event_type
    LIMIT 10
    """,
)
def event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value counts (D3): ``Series.value_counts().head(10)``
    (collect_earthquakes.py:64) as groupBy + ordered limit."""
    return value_counts(load(spark, "events", sf_dir), "event_type", k=10)


@register(
    "order_distinct_counts",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    """,
)
def order_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counts (D4): ``Series.nunique()``
    (validate_federal_awards.py:144). Exact here for oracle parity; at
    100 TB prefer approx_count_distinct (HLL, no expand)."""
    return load(spark, "orders", sf_dir).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


@register(
    "lineitem_global_stats",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_extendedprice), 2) AS total_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(median(CAST(l_quantity AS DOUBLE)), 4) AS median_qty,
           round(min(l_extendedprice), 2) AS min_price,
           round(max(l_extendedprice), 2) AS max_price
    FROM lineitem
    """,
)
def lineitem_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global stats (D5): sum/mean/median/min/max
    (validate_federal_awards.py:170-171). Exact median for oracle parity;
    at scale percentile_approx avoids the global sort."""
    return load(spark, "lineitem", sf_dir).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.median(F.col("l_quantity").cast("double")), 4).alias("median_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (C2/G2): the reference's set-difference orphan probe
    (star_schema.py:151) as a distributed LEFT ANTI join."""
    customer = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    return (
        anti_join_orphans(customer, orders, "c_custkey", "o_custkey")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "high_value_parties",
    oracle="""
    SELECT * FROM (
        SELECT c_name AS name, round(c_acctbal, 2) AS acctbal, 'customer' AS kind
        FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT s_name AS name, round(s_acctbal, 2) AS acctbal, 'supplier' AS kind
        FROM supplier WHERE s_acctbal > 5000
    )
    ORDER BY acctbal DESC, name
    """,
)
def high_value_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogeneous sources (G1):
    ``pd.concat(frames)`` (open_meteo.py:88) as unionByName."""
    customer = load(spark, "customer", sf_dir)
    supplier = load(spark, "supplier", sf_dir)
    c = customer.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_name").alias("name"),
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_name").alias("name"),
        F.round("s_acctbal", 2).alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return union_frames([c, s]).orderBy(F.desc("acctbal"), F.asc("name"))


@register(
    "revenue_by_region_segment",
    oracle="""
    SELECT r.r_name AS region, c.c_mktsegment AS segment,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, c.c_mktsegment
    ORDER BY region, segment
    """,
)
def revenue_by_region_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep join chain (C1) over the star: fact → fact join on orderkey is
    the only shuffle; every dim hop (customer/nation/region) broadcasts."""
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    customer = load(spark, "customer", sf_dir)
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy(
            F.col("r_name").alias("region"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("region", "segment")
    )


@register(
    "order_priority_share",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group share-of-total: aggregation + unpartitioned window over the
    (tiny) aggregated result — the full-table scan happens once."""
    from pyspark.sql import Window

    orders = load(spark, "orders", sf_dir)
    agg = orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))
    return agg.select(
        "o_orderpriority",
        "n_orders",
        F.round(
            F.col("n_orders") * F.lit(1.0) / F.sum("n_orders").over(Window.partitionBy()),
            6,
        ).alias("share"),
    ).orderBy("o_orderpriority")


@register(
    "top_part_nouns",
    oracle=r"""
    SELECT regexp_extract(p_name, '\s(\w+)$', 1) AS noun, count(*) AS n
    FROM part
    GROUP BY 1
    ORDER BY n DESC, noun
    LIMIT 10
    """,
)
def top_part_nouns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract + value counts (H3 + D3): the reference's
    region-from-place extraction and top-10 tally
    (collect_earthquakes.py:64), re-shaped onto part names. Map-side
    regexp_extract, one low-cardinality shuffle, TakeOrderedAndProject for
    the deterministic (count desc, noun asc) top-k."""
    part = load(spark, "part", sf_dir)
    return (
        part.select(
            F.regexp_extract("p_name", r"\s(\w+)$", 1).alias("noun")
        )
        .groupBy("noun")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "noun")
        .limit(10)
    )


@register(
    "customer_padded_keys",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS cik
    FROM customer
    ORDER BY c_custkey
    LIMIT 10
    """,
)
def customer_padded_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-pad cast (B7/H6 + F3): ``astype(str).str.zfill(10)`` and
    ``.head(10)`` (validate_sec_filings.py:65,169) as lpad over a
    deterministic ordered limit."""
    cust = load(spark, "customer", sf_dir)
    return (
        cust.select(
            "c_custkey",
            F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("cik"),
        )
        .orderBy("c_custkey")
        .limit(10)
    )
