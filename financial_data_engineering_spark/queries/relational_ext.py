"""Relational extensions beyond the reference surface: range joins,
interval-overlap joins, exact rank-based quantiles, and classic TPC-H
multi-join shapes. Registered early so correctness-gate windows cover the
newest queries first (the long-verified core relational rows register
last).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import topk
from financial_data_engineering_spark.operators.cdc import (
    apply_changelog,
    scd2_intervals,
)
from financial_data_engineering_spark.partitioning import materialize
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load


@register(
    "customer_cdc_merge",
    oracle="""
    WITH mx AS (SELECT max(c_custkey) AS maxk FROM customer),
    chg AS (
        SELECT CASE WHEN o_orderpriority = '1-URGENT'
                    THEN o_custkey + maxk ELSE o_custkey END AS custkey,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 'I'
                    WHEN o_orderpriority = '5-LOW' THEN 'D'
                    ELSE 'U' END AS op,
               CAST(round(o_totalprice * 100) AS BIGINT) AS acctbal_e2,
               o_orderdate, o_orderkey
        FROM orders CROSS JOIN mx
    ),
    last AS (
        SELECT custkey, op, acctbal_e2
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY custkey
                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM chg)
        WHERE rn = 1
    ),
    snap AS (SELECT c_custkey AS custkey,
                    CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_e2
             FROM customer)
    SELECT coalesce(s.custkey, l.custkey) AS custkey,
           CASE WHEN l.custkey IS NULL THEN 'kept'
                WHEN s.custkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS status,
           coalesce(l.acctbal_e2, s.acctbal_e2) AS acctbal_e2
    FROM snap s FULL JOIN last l ON s.custkey = l.custkey
    WHERE l.op IS NULL OR l.op <> 'D'
    ORDER BY custkey
    """,
)
def customer_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics against a plain-parquet snapshot: replay an
    insert/update/delete changelog onto the customer table with
    last-writer-wins resolution (operators/cdc.py apply_changelog) — the
    CDC-ingestion / incremental-maintenance primitive table formats give
    you and this engine composes from an argmax window over the CHANGE
    set plus one full-outer key join (the snapshot is never windowed).

    The changelog is derived deterministically from orders: urgent
    orders INSERT a new account (key shifted past the snapshot key
    space by max custkey — the 1-row max attaches as a constant-key
    broadcast join, no collect), low-priority orders DELETE the
    account, the rest UPDATE the balance to the order total; the
    (o_orderdate, o_orderkey) pair is the required total order. Deletes
    on keys with a later update resurrect correctly because only the
    final change per key is applied.
    """
    customer = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    mx = (
        customer.agg(F.max("c_custkey").alias("maxk"))
        .withColumn("_k", F.lit("_"))
    )
    changes = (
        orders.withColumn("_k", F.lit("_"))
        .join(F.broadcast(mx), "_k")
        .select(
            F.when(
                F.col("o_orderpriority") == "1-URGENT",
                F.col("o_custkey") + F.col("maxk"),
            )
            .otherwise(F.col("o_custkey"))
            .alias("custkey"),
            F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("I"))
            .when(F.col("o_orderpriority") == "5-LOW", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("acctbal_e2"),
            "o_orderdate",
            "o_orderkey",
        )
    )
    snap = customer.select(
        F.col("c_custkey").alias("custkey"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_e2"),
    )
    merged = apply_changelog(
        snap,
        changes,
        "custkey",
        ["o_orderdate", "o_orderkey"],
        payload=["acctbal_e2"],
    )
    return merged.orderBy("custkey")

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


#: Price-axis bucket for the two-level cumulative sum in
#: lineitem_price_quantiles: the price DOMAIN is a fixed business range
#: (TPC-H extended prices span ~900..105k), so a constant width keeps
#: the bucket table at a few hundred rows at ANY row count — this is
#: domain partitioning, not a tuned local constant. floor() is monotone,
#: so bucket order equals price order and the prefix-sum decomposition
#: is exact. (A function, not a module-level Column: Column construction
#: needs an active SparkContext.)
def _price_bucket():
    return F.floor(F.col("l_extendedprice") / 1024).cast("long")


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
    """Exact discrete quantiles per return flag — the inverted-CDF
    definition (value at rank ceil(p·n)), computed HISTOGRAM-FIRST: the
    row-level sort the oracle spells out would run as one giant
    external sort per flag (l_returnflag has 3 values — the
    fixed-cardinality-key bottleneck: 3 tasks each sorting a third of
    100 TB), but the value at any rank depends only on the PRICE
    MULTISET, never the tie-break, so the plan collapses to
    (flag, price) counts first — a map-side-combined aggregate whose
    shuffle spreads over the full cluster and whose output is bounded
    by the price DOMAIN (e2 integers), not row count — then walks the
    cumulative histogram per flag, picking the price whose cumulative
    range [lo, hi) covers each target rank. Round-8 measurement at the
    sf1 replica: 10.4 s (row sort) -> 1.9 s (histogram), identical
    rows. Values pass through untouched, so the oracle comparison
    (which keeps the row-level formulation — same multiset, same
    result) stays bit-exact."""
    li = load(spark, "lineitem", sf_dir)
    from pyspark.sql.window import Window

    from financial_data_engineering_spark.partitioning import spread_by

    hist = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).alias("c")
    )
    # Two-level cumulative sum (queued since r8): a single
    # flag-partitioned running sum runs the whole domain-bounded
    # histogram through 3 tasks (l_returnflag has 3 values — the
    # fixed-cardinality-key bottleneck this query already dodged once
    # by going histogram-first). Bucketing the price axis
    # (floor(price / 1024) — the price DOMAIN is fixed, so the bucket
    # count is a few hundred at any corpus size) splits the running
    # sum into (1) per-(flag, bucket) totals cumulated flag-wide over
    # the few-hundred-row bucket table — trivially small — and (2)
    # within-bucket running sums windowed by (flag, bucket), which
    # parallelize across 3 x |buckets| partitions instead of 3.
    # hi = bucket offset + within-bucket cum is the same prefix sum by
    # associativity, so lo/hi/n and every pick are unchanged.
    # materialize() because BOTH downstream branches (bucket totals and
    # the within-bucket window) consume the histogram — measured: the
    # un-materialized plan scanned lineitem and re-ran the histogram
    # aggregate twice (no runtime exchange reuse fired across the join
    # branches). The spread_by comes AFTER the join, where it IS the
    # window's exchange at explicit (coalesce-exempt) full width — a
    # checkpoint under AQE scans back as UnknownPartitioning (verified
    # in the executed plan), so partitioning established before the
    # materialize cannot be reused behind it.
    from financial_data_engineering_spark.partitioning import materialize

    hist = materialize(hist.withColumn("b", _price_bucket()))
    bt = hist.groupBy("l_returnflag", "b").agg(F.sum("c").alias("bc"))
    wo = (
        Window.partitionBy("l_returnflag")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = bt.select(
        "l_returnflag",
        "b",
        F.coalesce(F.sum("bc").over(wo), F.lit(0).cast("long")).alias("off"),
        F.sum("bc").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    wb = (
        Window.partitionBy("l_returnflag", "b")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        spread_by(
            hist.join(F.broadcast(off), ["l_returnflag", "b"]),
            "l_returnflag",
            "b",
        )
        .select(
            "l_returnflag",
            "l_extendedprice",
            "c",
            "n",
            (F.col("off") + F.sum("c").over(wb)).alias("hi"),
        )
        .select(
            "l_returnflag",
            "l_extendedprice",
            (F.col("hi") - F.col("c")).alias("lo"),
            "hi",
            "n",
        )
    )

    def pick(p: float, name: str):
        pos = F.greatest(F.lit(1), F.ceil(F.lit(p) * F.col("n")).cast("bigint"))
        return F.max(
            F.when(
                (pos > F.col("lo")) & (pos <= F.col("hi")),
                F.col("l_extendedprice"),
            )
        ).alias(name)

    return (
        cum.groupBy("l_returnflag")
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
           CAST((2 * sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                 + 100) // 200 AS BIGINT) AS revenue_e2,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_e2 DESC, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped high-revenue orders for one market
    segment. The segment filter prunes customer BEFORE its broadcast, the
    date predicates push into both fact scans, and the only shuffle is
    the post-join aggregation on l_orderkey; the top-10 is
    TakeOrderedAndProject, not a full sort.

    Revenue is integer-exact: price and discount are 2-decimal by TPC-H
    construction, so round(price·100)·(100 − round(disc·100)) is the
    EXACT e4 revenue per item as a long — summed without float error,
    then half-up-divided to e2. A ``round(sum(double), 2)`` here depends
    on summation order at the last ulp, which Spark does not fix across
    partitions (int64 headroom: per-order e4 sums < 1e13 at any SF)."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load(spark, "customer", sf_dir)
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, "orders", sf_dir).filter(F.col("o_orderdate") < cutoff)
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_shipdate") > cutoff)
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev_e4).alias("_rev_e4"))
        .select(
            "l_orderkey",
            F.expr("(2 * _rev_e4 + 100) div 200").alias("revenue_e2"),
            "o_orderdate",
            "o_orderpriority",
        )
    )
    return topk(agg, [F.desc("revenue_e2"), F.asc("l_orderkey")], 10)


@register(
    "region_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST((2 * sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                 + 100) // 200 AS BIGINT) AS revenue_e2,
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
    ORDER BY revenue_e2 DESC, nation
    """,
)
def region_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue from LOCAL supply chains (customer and
    supplier in the same nation) within one region and year. Five joins,
    one fact-fact shuffle: nation and region broadcast by hint (constant
    cardinality); customer and supplier are unhinted two-column
    projections, so the size estimator/AQE broadcasts them while they fit
    and falls back to a shuffle join at the SF where they no longer do.
    lineitem↔orders is the single fact-fact join, and the same-nation
    predicate rides the supplier join. Region and date filters prune
    before anything moves. Revenue is the exact e4-integer sum
    (2dp price x 2dp discount — see shipping_priority_revenue), half-up
    to e2: no order-dependent double summation survives to the output.
    Int64 headroom: per-nation yearly e4 sums reach ~3e18 near SF 1e5 —
    inside int64, noted for anyone pushing the window wider."""
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
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100).cast("long")
                )
            ).alias("_rev_e4"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "nation",
            F.expr("(2 * _rev_e4 + 100) div 200").alias("revenue_e2"),
            "n_items",
        )
        .orderBy(F.desc("revenue_e2"), "nation")
    )


@register(
    "priority_fulfillment_latency",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lineitems,
           CAST(min(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
               AS min_days,
           CAST(max(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
               AS max_days,
           CAST((2 * sum(date_diff('day', o_orderdate, l_shipdate)) * 100
                 + count(*)) // (2 * count(*)) AS BIGINT) AS avg_days_e2
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def priority_fulfillment_latency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency distribution per priority: date arithmetic
    (datediff) aggregated to min/max/exact-e2 mean. The lineitem-orders
    join shuffles both sides on orderkey — the canonical co-partitioned
    fact-to-fact join that the bucketed layout (transform/bucketed.py)
    turns into a 0-Exchange SMJ when both tables are bucket-written."""
    li = load(spark, "lineitem", sf_dir)
    orders = load(spark, "orders", sf_dir)
    lat = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.min("days").cast("long").alias("min_days"),
            F.max("days").cast("long").alias("max_days"),
            F.expr(
                "(2 * sum(days) * 100 + count(*)) div (2 * count(*))"
            ).alias("avg_days_e2"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "lineitem_measure_unpivot",
    oracle="""
    WITH long AS (
        SELECT l_returnflag, measure, CAST(round(value * 100) AS BIGINT)
                   AS value_e2
        FROM lineitem
        UNPIVOT (value FOR measure IN
                 (l_quantity, l_extendedprice, l_discount, l_tax))
    )
    SELECT l_returnflag,
           measure,
           count(*) AS n_values,
           CAST(sum(value_e2) AS BIGINT) AS total_e2,
           CAST(max(value_e2) AS BIGINT) AS max_e2
    FROM long
    GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
    """,
)
def lineitem_measure_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long reshape), the inverse of
    orders_priority_pivot: the four lineitem measures melt into
    (measure, value) rows via ``stack`` — a map-side Generate, NOT a
    union of four scans (one pass over the table, the generator
    quadruples rows after column pruning) — then a grouped rollup.
    One shuffle for the aggregate; the presentation sort folds into
    the 20-row result.

    NULL measures are filtered explicitly: DuckDB's UNPIVOT drops NULL
    values while Spark's ``stack`` keeps them, so without the filter the
    two sides agree only by the accident of lineitem's non-null columns —
    the filter makes them agree by construction."""
    li = load(spark, "lineitem", sf_dir)
    long = li.select(
        "l_returnflag",
        F.expr(
            "stack(4, 'l_quantity', l_quantity,"
            " 'l_extendedprice', l_extendedprice,"
            " 'l_discount', l_discount,"
            " 'l_tax', l_tax) AS (measure, value)"
        ),
    ).where(F.col("value").isNotNull()).select(
        "l_returnflag",
        "measure",
        F.round(F.col("value") * 100).cast("long").alias("value_e2"),
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum("value_e2").alias("total_e2"),
            F.max("value_e2").alias("max_e2"),
        )
        .orderBy("l_returnflag", "measure")
    )


@register(
    "customer_order_stats_salted",
    oracle="""
    SELECT c.c_mktsegment AS mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_e2
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY mktsegment
    """,
)
def customer_order_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through the EXPLICIT skew-salted join
    (operators/skew.py): the orders probe side is salted on its non-key
    columns, the customer build side replicated once per salt, and the
    join runs on (custkey, salt) — spreading any hot customer across 16
    reducers. Output is row-for-row identical to the unsalted join, which
    is exactly what the oracle checks: the salting must change the
    shuffle distribution and NOTHING else.

    This is the de-skew path for when AQE's runtime skew splitting can't
    apply (a sort-merge join whose build side is replicable but not
    broadcastable); at bench scale the replicated build side still
    auto-broadcasts, so the plan stays exchange-light while the salted
    key shape is pinned by tests/test_scale_layout.py."""
    from financial_data_engineering_spark.operators.skew import salted_join

    orders = load(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        "o_totalprice",
    )
    customer = load(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, customer, ["custkey"], n_salts=16)
    return (
        joined.groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100).cast("long")
            ).alias("revenue_e2"),
        )
        .orderBy("mktsegment")
    )


@register(
    "small_quantity_order_revenue",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
               count(*) AS n_items
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT p.p_brand AS brand,
           count(*) AS n_small_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_e2
    FROM lineitem l
    JOIN per_part pp ON l.l_partkey = pp.l_partkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE 5 * CAST(l.l_quantity AS BIGINT) * pp.n_items < pp.total_qty
    GROUP BY 1
    ORDER BY brand
    """,
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — the correlated-aggregate filter: lineitems whose
    quantity is below 20% of their part's average, rolled up to revenue
    per brand. The classic pandas formulation is a per-part loop; here
    the correlated subquery is a per-part aggregate REJOINED to the fact
    (one self-aggregation shuffle, co-partitioned with the join on
    l_partkey — AQE coalesces the pair), and the 20%-of-mean predicate
    is integer-exact: ``5·qty·n < total`` avoids the float average whose
    summation order differs across engines. TPC-H quantities are
    integral by construction; the BIGINT cast is exact."""
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir)
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )
    small = (
        li.join(per_part, "l_partkey")
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("n_items")
            < F.col("total_qty")
        )
        .join(part, li.l_partkey == part.p_partkey)
    )
    return (
        small.groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_small_items"),
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("revenue_e2"),
        )
        .orderBy("brand")
    )


@register(
    "order_priority_delayed_counts",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def order_priority_delayed_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q4 shape — the correlated EXISTS: orders in one quarter with
    at least one lineitem shipped more than 90 days after the order date
    (the reference's commit/receipt columns don't exist in this corpus;
    the delay predicate stands in), counted per priority.

    EXISTS compiles to a LEFT SEMI join — each order emitted at most
    once no matter how many delayed items it has, with no distinct step
    and early probe-side short-circuit. The join is equi on l_orderkey
    with the delay comparison as the residual condition; the quarter
    filter prunes orders at the scan, and the one shuffle pair is the
    co-partitioned orderkey join (0-Exchange under the bucketed layout).
    """
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    delayed = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 90)),
        "left_semi",
    )
    return (
        delayed.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "customer_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape — the outer-join count distribution: how many
    customers placed exactly N (non-urgent) orders, INCLUDING the
    zero-order customers only an outer join can see (the corpus has no
    o_comment, so the priority filter stands in for Q13's comment
    exclusion).

    Plan note (outer-join skew): the textbook formulation left-joins
    customer to the raw orders fact and aggregates twice, so a hot
    customer fans its join row count to its order count. Here orders
    pre-aggregate to one (custkey, cnt) row FIRST — the join input is
    bounded by |customer| regardless of order skew, the exclusion
    filter is pushed below the aggregate, and the left join then maps
    missing customers to cnt 0. The second aggregate (count-of-counts)
    groups on c_count whose cardinality is tiny, AFTER the data has
    already collapsed to one row per customer — not a skew hazard."""
    customer = load(spark, "customer", sf_dir).select("c_custkey")
    orders = load(spark, "orders", sf_dir)
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        customer.join(per_cust, "c_custkey", "left")
        .select(F.coalesce("cnt", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "suppliers_kept_order_waiting",
    oracle="""
    WITH late AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    qual AS (
        SELECT l1.l_orderkey, l1.l_suppkey
        FROM late l1
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
    )
    SELECT s.s_name AS supplier, n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS numwait
    FROM qual q
    JOIN supplier s ON q.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    ORDER BY numwait DESC, supplier
    LIMIT 25
    """,
)
def suppliers_kept_order_waiting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape — the dual correlated-semijoin chain: suppliers
    who were the SOLE late shipper on a finished multi-supplier order
    (the corpus has no commit/receipt dates, so "late" = shipped >90
    days after the order date, the same stand-in the Q4 analog uses;
    counted once per (order, supplier) so the metric is
    orders-kept-waiting, not lines).

    Plan notes: EXISTS compiles to LEFT SEMI and NOT EXISTS to LEFT
    ANTI, both hash joins keyed on l_orderkey with the supplier
    inequality as a residual condition — the two probes share the same
    shuffle key as the late-set build, so AQE coalesces the chain into
    co-partitioned stages with no extra exchange. The late set is
    DISTINCT (order, supplier) pairs — bounded by the fact's key space,
    built once and reused for both the probe side and the anti side.
    supplier and nation are broadcast dims; the final top-25 is a
    TakeOrderedAndProject over a |suppliers|-row aggregate, ordered
    totally (numwait desc, unique supplier name asc)."""
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    orders = load(spark, "orders", sf_dir)
    supplier = load(spark, "supplier", sf_dir)
    nation = load(spark, "nation", sf_dir)
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        load(spark, "lineitem", sf_dir)
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l1 = late.alias("l1")
    l2 = li.alias("l2")
    l3 = late.alias("l3")
    qual = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "leftsemi",
        )
        .alias("l1")
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "leftanti",
        )
    )
    agg = (
        qual.join(
            F.broadcast(supplier),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("s_name").alias("supplier"), F.col("n_name").alias("nation")
        )
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return topk(agg, [F.desc("numwait"), F.asc("supplier")], 25)


@register(
    "inactive_rich_customers_by_nation",
    oracle="""
    WITH sub AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_e2
        FROM customer WHERE c_nationkey % 5 IN (0, 2)
    ),
    stats AS (
        SELECT CAST(sum(bal_e2) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM sub WHERE bal_e2 > 0
    ),
    cand AS (
        SELECT c_custkey, c_nationkey, bal_e2
        FROM sub CROSS JOIN stats
        WHERE bal_e2 * n > s
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = sub.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP '2000-06-01 00:00:00')
    )
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(bal_e2) AS BIGINT) AS totacctbal_e2
    FROM cand JOIN nation n ON cand.c_nationkey = n.n_nationkey
    GROUP BY 1
    ORDER BY 1
    """,
)
def inactive_rich_customers_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape — scalar-avg subquery + anti-join: customers in a
    nation subset (the stand-in for Q22's phone country codes) with an
    above-average positive balance and NO order since mid-2000 (every
    customer in this corpus has SOME order, so Q22's never-ordered
    predicate becomes gone-inactive — same anti-join, non-empty answer),
    rolled up per nation.

    Plan notes: the scalar subquery is a 1-row (sum, count) aggregate
    broadcast-cross-joined to the filtered customers — Spark never
    re-executes it per row — and the above-average test is the exact
    integer cross-multiplication ``bal_e2 · n > s`` (no float average,
    no cross-engine summation-order hazard). NOT EXISTS is a LEFT ANTI
    join against orders pre-filtered to the recent window — the filter
    is pushed into the parquet scan, so the anti build side shrinks
    from |orders| to the recent slice before any shuffle. nation is a
    broadcast dim; output is |nation-subset| rows."""
    customer = load(spark, "customer", sf_dir)
    orders = load(spark, "orders", sf_dir)
    nation = load(spark, "nation", sf_dir)
    sub = customer.filter((F.col("c_nationkey") % 5).isin(0, 2)).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_e2"),
    )
    stats = sub.filter(F.col("bal_e2") > 0).agg(
        F.sum("bal_e2").alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    cand = (
        sub.join(F.broadcast(stats))
        .filter(F.col("bal_e2") * F.col("n") > F.col("s"))
        .join(recent, "c_custkey", "leftanti")
    )
    return (
        cand.join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal_e2").alias("totacctbal_e2"),
        )
        .orderBy("nation")
    )


@register(
    "part_value_concentration",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS value_e2
        FROM lineitem
        GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(sum(value_e2) AS BIGINT) AS total_e2,
               CAST(count(*) AS BIGINT) AS n_parts
        FROM per_part
    )
    SELECT CAST(l_partkey AS BIGINT) AS partkey, value_e2
    FROM per_part CROSS JOIN tot
    WHERE value_e2 * n_parts * 2 > total_e2 * 3
    ORDER BY value_e2 DESC, partkey
    """,
)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — the share-of-total HAVING: parts whose total
    lineitem value exceeds 1.5x the per-part average (Q11's
    fraction-of-global-stock threshold, as the exact integer
    cross-multiplication ``v·n·2 > total·3`` — no float division on
    either engine).

    Plan notes: ONE aggregation produces the per-part values; the
    global (total, count) is a second aggregate OVER THAT RESULT — a
    |parts|-row frame, not a second fact scan — attached back as a
    1-row broadcast. At 100 TB the fact is read once, and Q11's
    classic trap (recomputing the global sum per group via a
    correlated subquery) never appears in the plan."""
    li = load(spark, "lineitem", sf_dir)
    per_part = materialize(
        li.groupBy("l_partkey").agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
            ).alias("value_e2")
        )
    )
    tot = per_part.agg(
        F.sum("value_e2").alias("total_e2"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(tot))
        .filter(
            F.col("value_e2") * F.col("n_parts") * 2
            > F.col("total_e2") * 3
        )
        .select(F.col("l_partkey").alias("partkey"), "value_e2")
        .orderBy(F.desc("value_e2"), "partkey")
    )


@register(
    "top_quarter_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                   * 10000) AS BIGINT)) AS BIGINT)
                   AS revenue_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    ),
    mx AS (SELECT CAST(max(revenue_e4) AS BIGINT) AS max_rev FROM rev)
    SELECT s.s_name AS supplier, r.revenue_e4
    FROM rev r
    CROSS JOIN mx
    JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.revenue_e4 = max_rev
    ORDER BY supplier
    """,
)
def top_quarter_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — max-over-aggregate-view: the supplier(s) whose
    1996-Q1 revenue equals the quarter's maximum (ALL ties emitted, the
    Q15 contract a bare top-1 limit would violate).

    Plan notes: per-row revenue quantizes to an e4 integer BEFORE the
    per-supplier sum (exact under any shuffle order — the tfidf
    lesson), the 1-row max is an aggregate over the |suppliers|-row
    view joined back as a broadcast (never a global window over the
    fact), the date filter pushes to the parquet scan, and supplier is
    a broadcast dim. The view frame is materialized because both the
    max and the equality filter consume it."""
    li = load(spark, "lineitem", sf_dir)
    supplier = load(spark, "supplier", sf_dir)
    rev = materialize(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * 10000
                ).cast("long")
            ).alias("revenue_e4")
        )
    )
    mx = rev.agg(F.max("revenue_e4").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("revenue_e4") == F.col("max_rev"))
        .join(
            F.broadcast(supplier),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(F.col("s_name").alias("supplier"), "revenue_e4")
        .orderBy("supplier")
    )


@register(
    "customer_scd2_history",
    oracle="""
    SELECT CAST(o_custkey AS BIGINT) AS custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_e2,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS valid_to,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
    FROM orders
    ORDER BY custkey, version
    """,
)
def customer_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build (J-family extension): the
    order stream as a per-customer version history — each order opens a
    new version carrying its total, valid over the half-open
    [valid_from, valid_to) interval, NULL-terminated on the current
    version. This is the dimension table a point-in-time fact join
    (operators/asof.py) consumes, and the history that the
    last-writer-wins CDC merge (customer_cdc_merge) deliberately
    discards — together they are the two halves of warehouse change
    tracking.

    Plan: ONE window partitioned by custkey (cardinality scales with
    the data — no low-card hazard, no join, no second pass; row_number
    and both lead() calls share the single sort). The presentation sort
    reuses nothing downstream; at 100 TB the unsorted frame IS the
    dimension you'd write, clustered by (custkey, valid_from) for the
    as-of join's range locality."""
    orders = load(spark, "orders", sf_dir)
    changes = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("total_e2"),
        "o_orderdate",
        "o_orderkey",
    )
    return scd2_intervals(
        changes,
        "custkey",
        ["o_orderdate", "o_orderkey"],
        payload=["total_e2"],
    ).orderBy("custkey", "version")
