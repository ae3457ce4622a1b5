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


@register(
    "order_week_shipments",
    oracle="""
    SELECT o.o_orderkey,
           count(*) AS n_items,
           CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM orders o
    JOIN lineitem l
      ON l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
    GROUP BY o.o_orderkey
    ORDER BY o.o_orderkey
    """,
)
def order_week_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-keyed big×big interval join: per order, ALL lineitems (any
    order) shipped inside [o_orderdate, o_orderdate + 7 days) — the
    market-activity-around-an-event query shape.

    The scale move is PRE-AGGREGATION BEFORE the range join: the raw
    pairing is quadratic in scale factor (every order matches every
    shipment in its week — ~255M pairs at sf0.1, measured 70 s), but the
    additive aggregates only need per-DAY shipment totals, and the day
    axis is bounded by the calendar, not the data. Rolling lineitem up to
    (ship_day, n, qty) first makes the interval join |orders| x 7 days —
    linear in scale factor (measured 0.8 s, 87x) and identical output.
    The join itself is the bucketed range-join operator: equi-join on
    weekly buckets + containment filter, no nested loop. Quantities sum
    as BIGINT so the aggregate is engine-exact."""
    from financial_data_engineering_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("start_day"),
        (F.expr("unix_micros(o_orderdate) div 86400000000") + 7).alias(
            "end_day"
        ),
    )
    ship_days = (
        load(spark, "lineitem", sf_dir)
        .select(
            F.expr("unix_micros(l_shipdate) div 86400000000").alias("ship_day"),
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
        .groupBy("ship_day")
        .agg(
            F.count(F.lit(1)).alias("day_items"),
            F.sum("qty").alias("day_qty"),
        )
    )
    return (
        point_in_interval_join(
            ship_days, orders, "ship_day", "start_day", "end_day", bucket_width=7
        )
        .groupBy("o_orderkey")
        .agg(
            F.sum("day_items").alias("n_items"),
            F.sum("day_qty").alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "lineitem_price_quantiles",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
    )
    SELECT l_returnflag,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))
               THEN l_extendedprice END) AS p25,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.50 * n) AS BIGINT))
               THEN l_extendedprice END) AS p50,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.75 * n) AS BIGINT))
               THEN l_extendedprice END) AS p75,
           max(CASE WHEN rn = greatest(1, CAST(ceil(0.90 * n) AS BIGINT))
               THEN l_extendedprice END) AS p90
    FROM ranked
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def lineitem_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles per return flag, computed the
    engine-portable way: rank rows in one window pass (deterministic
    tie-break on the full key) and pick the value at position
    ceil(p·n) — the inverted-CDF definition, spelled out so both engines
    run the identical integer index selection instead of their own
    quantile builtins (whose boundary conventions differ). Values pass
    through untouched, so the comparison is bit-exact. One shuffle for
    the window, map-side conditional aggregation after.

    At 100 TB the exact-rank pass costs a full sort per group; swap in
    approx_percentile for monitoring paths and keep this for audits."""
    li = load(spark, "lineitem", sf_dir)
    from pyspark.sql.window import Window

    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(p: float, name: str):
        pos = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")).cast("bigint"))
        return F.max(
            F.when(F.col("rn") == pos, F.col("l_extendedprice"))
        ).alias(name)

    return (
        ranked.groupBy("l_returnflag")
        .agg(pick(0.25, "p25"), pick(0.50, "p50"), pick(0.75, "p75"), pick(0.90, "p90"))
        .orderBy("l_returnflag")
    )


@register(
    "customer_overlapping_orders",
    oracle="""
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a,
           b.o_orderkey AS order_b,
           CAST(date_diff('day',
                greatest(a.o_orderdate, b.o_orderdate),
                least(a.o_orderdate + INTERVAL 7 DAY,
                      b.o_orderdate + INTERVAL 7 DAY)) AS BIGINT)
               AS overlap_days
    FROM orders a
    JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.o_orderdate < b.o_orderdate + INTERVAL 7 DAY
     AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
    ORDER BY custkey, order_a, order_b
    """,
)
def customer_overlapping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed interval-overlap self-join: pairs of the SAME customer's
    orders whose 7-day windows overlap — the burst-activity detector.
    Runs on the bucketed interval-overlap operator: both sides explode
    onto weekly buckets, equi-join on (custkey, bucket), and each
    overlapping pair survives exactly once via the first-shared-bucket
    filter (no distinct shuffle). The customer key bounds per-bucket
    multiplicity, so the join scales with orders-per-customer-week, not
    corpus size. overlap_days is exact integer day arithmetic."""
    from financial_data_engineering_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    base = load(spark, "orders", sf_dir).select(
        "o_custkey",
        "o_orderkey",
        F.expr("unix_micros(o_orderdate) div 86400000000").alias("day"),
    )
    left = base.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        F.col("day").alias("a_start"),
        (F.col("day") + 7).alias("a_end"),
    )
    right = base.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_b"),
        F.col("day").alias("b_start"),
        (F.col("day") + 7).alias("b_end"),
    )
    return (
        interval_overlap_join(
            left,
            right,
            "a_start",
            "a_end",
            "b_start",
            "b_end",
            bucket_width=7,
            keys=["custkey"],
        )
        .filter(F.col("order_a") < F.col("order_b"))
        .select(
            "custkey",
            "order_a",
            "order_b",
            (
                F.least(F.col("a_end"), F.col("b_end"))
                - F.greatest(F.col("a_start"), F.col("b_start"))
            ).alias("overlap_days"),
        )
        .orderBy("custkey", "order_a", "order_b")
    )


@register(
    "shipping_priority_revenue",
    oracle="""
    SELECT l.l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped high-revenue orders for one market
    segment. The segment filter prunes customer BEFORE its broadcast, the
    date predicates push into both fact scans, and the only shuffle is
    the post-join aggregation on l_orderkey; the top-10 is
    TakeOrderedAndProject, not a full sort."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, "orders", sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > cutoff)
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )
    return topk(agg, [F.desc("revenue"), F.asc("l_orderkey")], 10)


@register(
    "region_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def region_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from LOCAL supply chains (customer and
    supplier in the same nation) within one region and year. Five joins,
    one shuffle: every dimension side (customer, supplier, nation,
    region) broadcasts, lineitem↔orders is the single fact-fact join,
    and the same-nation predicate rides the supplier broadcast join.
    Region and date filters prune before anything moves."""
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, "lineitem", sf_dir)
    supp = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "nation")
    )
