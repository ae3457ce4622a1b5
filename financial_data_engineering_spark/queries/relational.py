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
    WITH b AS (
        SELECT l_returnflag, l_linestatus,
               CAST(l_quantity AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
               CAST(round(l_discount * 100) AS BIGINT) AS d,
               CAST(round(l_tax * 100) AS BIGINT) AS t
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    ),
    a AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(q) AS BIGINT) AS sum_qty,
               CAST(sum(p) AS BIGINT) AS sum_base_price_e2,
               CAST(sum(p * (100 - d)) AS BIGINT) AS sum_disc_price_e4,
               CAST(sum(p * (100 - d) * (100 + t)) AS BIGINT) AS sum_charge_e6,
               CAST(sum(d) AS BIGINT) AS dsum,
               count(*) AS count_order
        FROM b GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           sum_qty, sum_base_price_e2, sum_disc_price_e4, sum_charge_e6,
           CAST((2 * sum_qty * 10000 + count_order) // (2 * count_order)
                AS BIGINT) AS avg_qty_e4,
           CAST((2 * sum_base_price_e2 * 100 + count_order)
                // (2 * count_order) AS BIGINT) AS avg_price_e4,
           CAST((2 * dsum * 100 + count_order) // (2 * count_order)
                AS BIGINT) AS avg_disc_e4,
           count_order
    FROM a
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
    # Exact integer domain: prices/discount/tax are 2-decimal-exact in the
    # data, so cents (e2) / e4 / e6 long arithmetic replays bit-identically
    # on any engine and is immune to float summation order. Headroom: e6
    # sums fit int64 up to ~9.2e18 (≈9e12 charge-dollars per group); beyond
    # that flip the accumulators to decimal(38,0) — same plan shape.
    q = F.col("l_quantity").cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    d = F.round(F.col("l_discount") * 100).cast("long")
    t = F.round(F.col("l_tax") * 100).cast("long")
    agg = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(q).alias("sum_qty"),
            F.sum(p).alias("sum_base_price_e2"),
            F.sum(p * (100 - d)).alias("sum_disc_price_e4"),
            F.sum(p * (100 - d) * (100 + t)).alias("sum_charge_e6"),
            F.sum(d).alias("_dsum"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    # Round-half-up averages at fixed decimal scale: (2*num*scale + den)
    # div (2*den) — the repo-standard engine-exact rounding idiom.
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price_e2",
        "sum_disc_price_e4",
        "sum_charge_e6",
        F.expr(
            "(2 * sum_qty * 10000 + count_order) div (2 * count_order)"
        ).alias("avg_qty_e4"),
        F.expr(
            "(2 * sum_base_price_e2 * 100 + count_order) div (2 * count_order)"
        ).alias("avg_price_e4"),
        F.expr(
            "(2 * _dsum * 100 + count_order) div (2 * count_order)"
        ).alias("avg_disc_e4"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


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
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_e2,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_e2 DESC, c_custkey
    LIMIT 20
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact→dim joins (C1/C3) + aggregation + top-k (F1).

    Nation is broadcast-hinted (constant 25 rows); customer is left to the
    size estimator/AQE because it grows with SF — auto-broadcast while it
    fits, shuffle join beyond, never a stale hint forcing a 100 TB-scale
    driver collect. Only the post-aggregation top-k is ordered, and that
    is TakeOrderedAndProject (per-partition heaps, no full sort).
    """
    orders = load(spark, "orders", sf_dir)
    customer = load(spark, "customer", sf_dir)
    nation = load(spark, "nation", sf_dir)
    joined = orders.join(
        customer, orders.o_custkey == customer.c_custkey
    ).join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    agg = joined.groupBy("c_custkey", "c_name", F.col("n_name").alias("nation")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
            "revenue_e2"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return topk(agg, [F.desc("revenue_e2"), F.asc("c_custkey")], 20)


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
           CAST(sum(CAST(round(l.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS latest_revenue_e2
    FROM latest l
    JOIN customer c ON l.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.rn = 1
    GROUP BY n.n_name
    ORDER BY latest_revenue_e2 DESC, nation
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
        latest.join(customer, latest.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "latest_revenue_e2"
            ),
        )
        .orderBy(F.desc("latest_revenue_e2"), F.asc("nation"))
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
    WITH b AS (
        SELECT CAST(l_quantity AS BIGINT) AS q,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS p
        FROM lineitem
    )
    SELECT count(*) AS n_rows,
           CAST(sum(p) AS BIGINT) AS total_price_e2,
           CAST((2 * sum(q) * 10000 + count(*)) // (2 * count(*))
                AS BIGINT) AS avg_qty_e4,
           median(CAST(q AS DOUBLE)) AS median_qty,
           CAST(min(p) AS BIGINT) AS min_price_e2,
           CAST(max(p) AS BIGINT) AS max_price_e2
    FROM b
    """,
)
def lineitem_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global stats (D5): sum/mean/median/min/max
    (validate_federal_awards.py:170-171). Exact median for oracle parity;
    at scale percentile_approx avoids the global sort."""
    li = load(spark, "lineitem", sf_dir)
    q = F.col("l_quantity").cast("long")
    p = F.round(F.col("l_extendedprice") * 100).cast("long")
    # median of integer quantities is k or k+0.5 — exactly representable,
    # so the double passes the cross-engine compare without rounding.
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(p).alias("total_price_e2"),
        F.expr(
            "(2 * sum(CAST(l_quantity AS BIGINT)) * 10000 + count(*))"
            " div (2 * count(*))"
        ).alias("avg_qty_e4"),
        F.median(q.cast("double")).alias("median_qty"),
        F.min(p).alias("min_price_e2"),
        F.max(p).alias("max_price_e2"),
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
        SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind
        FROM customer WHERE c_acctbal > 5000
        UNION ALL
        SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind
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
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    )
    s = supplier.filter(F.col("s_acctbal") > 5000).select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
    )
    return union_frames([c, s]).orderBy(F.desc("acctbal"), F.asc("name"))


@register(
    "revenue_by_region_segment",
    oracle="""
    SELECT r.r_name AS region, c.c_mktsegment AS segment,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_e4,
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
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupBy(
            F.col("r_name").alias("region"), F.col("c_mktsegment").alias("segment")
        )
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (100 - F.round(F.col("l_discount") * 100).cast("long"))
            ).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("region", "segment")
    )


@register(
    "order_priority_share",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST((2 * count(*) * 1000000 + sum(count(*)) OVER ())
                // (2 * sum(count(*)) OVER ()) AS BIGINT) AS share_e6
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
        F.expr(
            "(2 * n_orders * 1000000 + sum(n_orders) OVER ())"
            " div (2 * sum(n_orders) OVER ())"
        ).alias("share_e6"),
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
