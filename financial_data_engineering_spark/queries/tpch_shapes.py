"""The remaining canonical TPC-H plan shapes (Q2, Q6-Q10, Q12, Q14, Q16,
Q18-Q20).

Round 9 closed Q13/Q21/Q22; round 10 added Q7-Q10/Q14/Q16/Q18-Q20;
round 11 completes the family with the last three: the correlated
min-cost-supplier subquery (Q2), the single-scan conditional aggregate
(Q6), and the shipmode two-way conditional counts (Q12). All 22
canonical shapes now have analogs (Q1/Q3/Q5 live in
queries/relational.py as pricing_summary / shipping_priority_revenue /
region_local_supplier_volume; Q4/Q17 as order_priority_delayed_counts /
small_quantity_order_revenue; Q11/Q13/Q15/Q21/Q22 in
relational_ext.py — see COVERAGE.md's plan-shape inventory).

The corpus (TESTDATA.md) lacks partsupp / shipmode / container /
comment columns, so each analog substitutes a stand-in predicate of the
same selectivity class while preserving the PLAN shape — the thing a
Spark engine has to get right. Money math follows the repo contract
(queries/relational_ext.py): prices and discounts are exact 2dp, so
revenue is an integer e4 sum (cents x percent) halved up to e2 cents —
no float accumulation order can flip the driver's value hash. Ratios
are integer parts-per-million over the e2 sums for the same reason.

Reference parity anchors: the reference engine's query surface is
documented in SURVEY.md §2 (F-family rollups, C-family joins); these
extend the same families — there is no reference file to cite because
the reference has no TPC-H suite (reference core enumerated at 1,591
LoC, BASELINE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import topk
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

def _rev_e4():
    """Exact integer revenue: cents x (100 - discount percent) — an e4
    value. A function, not a module constant: Column construction needs
    an active SparkContext, which doesn't exist at import time."""
    return F.round(F.col("l_extendedprice") * 100).cast("long") * (
        F.lit(100) - F.round(F.col("l_discount") * 100).cast("long")
    )

#: Half-up e4 -> e2 (matches the DuckDB `(2*s + 100) // 200` idiom).
def _e4_to_e2(col: str):
    return F.expr(f"(2 * {col} + 100) div 200")


_REV_E4_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
)


@register(
    "nation_pair_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation,
           nc.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS l_year,
           CAST((2 * sum({_REV_E4_SQL}) + 100) // 200 AS BIGINT) AS revenue_e2
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def nation_pair_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bidirectional nation-pair volume: revenue shipped
    between two specific nations, in BOTH directions, by year.

    Plan notes: the pair predicate is a disjunction over columns from
    TWO different dimension chains (supplier-nation x customer-nation),
    so it cannot be pushed below either join alone — but each disjunct's
    nation membership CAN: both dim chains pre-filter to the two-nation
    set (nation broadcast into supplier/customer), shrinking both fact
    join inputs ~ |2/25| before the lineitem-orders fact-fact shuffle,
    and only the cross-pair (1-1 / 2-2) rows die at the residual
    disjunction. The date range prunes orders at the scan. At 100 TB the
    only large shuffle is lineitem<->orders on orderkey; everything else
    broadcasts."""
    two = ["NATION_1", "NATION_2"]
    nation = load(spark, "nation", sf_dir).filter(F.col("n_name").isin(two))
    supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load(spark, "customer", sf_dir)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev_e4()).alias("_rev_e4"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            _e4_to_e2("_rev_e4").alias("revenue_e2"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "nation_market_share",
    oracle=f"""
    WITH base AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST((2 * {_REV_E4_SQL} + 100) // 200 AS BIGINT) AS vol_e2,
               ns.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        JOIN region r   ON nc.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    )
    SELECT o_year,
           CAST((2 * 1000000 * sum(CASE WHEN supp_nation = 'NATION_3'
                                        THEN vol_e2 ELSE 0 END)
                 + sum(vol_e2)) // (2 * sum(vol_e2)) AS BIGINT) AS share_ppm,
           CAST(sum(vol_e2) AS BIGINT) AS market_e2
    FROM base
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — market share as a conditional-aggregate ratio:
    NATION_3 suppliers' share of all ECONOMY-part revenue sold into the
    ASIA region, per year (the corpus has no multi-word p_type, so the
    single word stands in for 'ECONOMY ANODIZED STEEL').

    Plan notes: the CASE-guarded numerator and the total share ONE
    aggregate pass — the classic Q8 trap is computing them as two
    aggregations joined on year. Dim chain (nation x2, region, part
    pre-filtered to ECONOMY) all broadcast; the one big shuffle is the
    fact-fact lineitem<->orders join. Share is integer ppm with half-up
    division over the e2 sums — both engines divide BIGINTs, no float.
    Int64 headroom: 2e6 x market_e2 caps at ~9.2e18 when a single
    year-slice's revenue reaches ~46 billion dollars-e2 (~SF 5e3 for
    this slice width) — noted, and far past the evidence scales."""
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    cust = (
        load(spark, "customer", sf_dir)
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp = (
        load(spark, "supplier", sf_dir)
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    part = load(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, "lineitem", sf_dir)
    vol_e2 = _e4_to_e2("_rev_e4_row").alias("vol_e2")
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            "supp_nation",
            _rev_e4().alias("_rev_e4_row"),
        )
        .select("o_year", "supp_nation", vol_e2)
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("vol_e2")).otherwise(
                    F.lit(0)
                )
            ).alias("_num"),
            F.sum("vol_e2").alias("market_e2"),
        )
        .select(
            "o_year",
            F.expr("(2 * 1000000 * _num + market_e2) div (2 * market_e2)").alias(
                "share_ppm"
            ),
            "market_e2",
        )
        .orderBy("o_year")
    )


@register(
    "profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST((2 * sum(
                    CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                    - (100 * CAST(round(p.p_retailprice * 100) AS BIGINT)
                           * CAST(l.l_quantity AS BIGINT)) // 2
                ) + 100) // 200 AS BIGINT) AS profit_e2
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and year:
    revenue minus cost for every 'bolt' part ever shipped. The corpus
    has no partsupp.ps_supplycost; cost stands in as half the part's
    retail price x quantity, which preserves the shape (a second priced
    column entering the sum from a different table than the discount).

    Plan notes: the p_name LIKE filter prunes part BEFORE the join
    (pushed to the part scan), and the filtered part (and supplier,
    nation) broadcast; lineitem<->orders on orderkey is again the only
    fact-fact shuffle. The profit expression is exact e4 integer per
    row (retail cents x qty x 100 / 2 is integral: the x100 keeps the
    halving exact), summed as BIGINT, halved-up to e2 once at the end."""
    part = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    nation = load(spark, "nation", sf_dir)
    orders = load(spark, "orders", sf_dir).select("o_orderkey", "o_orderdate")
    li = load(spark, "lineitem", sf_dir)
    cost_e4 = F.expr(
        "(100 * cast(round(p_retailprice * 100) as bigint)"
        " * cast(l_quantity as bigint)) div 2"
    )
    profit_e4 = _rev_e4() - cost_e4
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit_e4).alias("_profit_e4"))
        .select("nation", "o_year", _e4_to_e2("_profit_e4").alias("profit_e2"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "returned_item_top_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST((2 * sum({_REV_E4_SQL}) + 100) // 200 AS BIGINT) AS revenue_e2,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY 1, 2, 4
    ORDER BY revenue_e2 DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — the returned-item report: top 20 customers by
    revenue lost to returns in one quarter.

    Plan notes: both fact filters (returnflag on lineitem, the quarter
    on orders) push to their scans before the orderkey shuffle; the
    aggregate keys on custkey (high-cardinality, no skew hazard), and
    customer/nation attach AFTER the aggregate has collapsed to one row
    per customer — joining dims post-agg keeps the fact shuffle narrow
    (Q10's classic waste is carrying c_name/n_name through the join).
    Top-20 with the custkey tiebreak compiles to TakeOrderedAndProject."""
    li = load(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name", "c_nationkey")
    nation = load(spark, "nation", sf_dir)
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev_e4()).alias("_rev_e4"))
    )
    joined = (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            _e4_to_e2("_rev_e4").alias("revenue_e2"),
            F.col("n_name").alias("nation"),
        )
    )
    return topk(joined, [F.desc("revenue_e2"), F.asc("c_custkey")], 20)


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o.o_orderdate) AS BIGINT) AS o_month,
           CAST((2 * 1000000 * sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST((2 * {_REV_E4_SQL} + 100) // 200 AS BIGINT)
                     ELSE 0 END)
                 + sum(CAST((2 * {_REV_E4_SQL} + 100) // 200 AS BIGINT)))
                // (2 * sum(CAST((2 * {_REV_E4_SQL} + 100) // 200 AS BIGINT)))
                AS BIGINT) AS promo_ppm
    FROM lineitem l
    JOIN part p   ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY 1, 2
    ORDER BY o_year, o_month
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: the share of each month's
    revenue coming from PROMO-type parts, as integer parts-per-million.

    Plan notes: one aggregate pass computes numerator (CASE-guarded)
    and denominator together; part broadcasts (2-column projection),
    the date filter prunes orders at the scan, the orderkey shuffle is
    the only exchange before a 12-row result. Per-row revenue is
    half-up-rounded to e2 BEFORE the conditional sum so numerator and
    denominator are sums over the same integers on both engines."""
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).select("p_partkey", "p_type")
    orders = load(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    rev_e2_row = F.expr(
        "(2 * (cast(round(l_extendedprice * 100) as bigint)"
        " * (100 - cast(round(l_discount * 100) as bigint))) + 100) div 200"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.col("p_type"),
            rev_e2_row.alias("_rev_e2"),
        )
        .groupBy("o_year", "o_month")
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("_rev_e2")).otherwise(0)
            ).alias("_promo"),
            F.sum("_rev_e2").alias("_total"),
        )
        .select(
            "o_year",
            "o_month",
            F.expr("(2 * 1000000 * _promo + _total) div (2 * _total)").alias(
                "promo_ppm"
            ),
        )
        .orderBy("o_year", "o_month")
    )


@register(
    "supplier_cnt_by_part_attrs",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'BRAND_1'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def supplier_cnt_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier-count distribution over part attributes
    with a NOT-IN supplier exclusion (negative account balance stands in
    for Q16's '%Customer%Complaints%' comment filter; the corpus's
    lineitem is the part-supplier bridge in place of partsupp).

    Plan notes: the exclusion compiles to a LEFT ANTI join against a
    tiny broadcast build side (suppliers with s_acctbal < 0 — NOT IN
    over a non-nullable key is exactly anti-join semantics); part
    pre-filters on brand+size at its scan and broadcasts. The
    count(DISTINCT suppkey) aggregate is the real cost: Spark expands
    it to a two-phase aggregate (partial distinct on (group, suppkey),
    then count) — the same plan you'd hand-write, no row explosion."""
    bad_supp = (
        load(spark, "supplier", sf_dir)
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_suppkey"))
    )
    part = load(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "BRAND_1")
        & F.col("p_size").isin([1, 9, 14, 19, 23, 36, 45, 49])
    )
    li = load(spark, "lineitem", sf_dir).select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            li.l_suppkey == F.col("bad_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "large_volume_customers",
    oracle="""
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM lineitem GROUP BY 1
        HAVING sum(CAST(l_quantity AS BIGINT)) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_e2,
           b.total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice_e2 DESC, o_orderkey
    LIMIT 100
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — the HAVING-IN semijoin: orders whose total
    lineitem quantity exceeds a threshold, with their customers, top
    100 by order value.

    Plan notes: the textbook IN (GROUP BY ... HAVING) subquery is
    expressed directly as aggregate-then-join — the aggregate collapses
    lineitem to one row per order BEFORE any join (map-side partial
    sums do most of the work), the HAVING prunes to ~1% of orders, and
    the surviving keys join orders then customer. Both joins key on
    high-cardinality keys; the qualifying set is small enough that AQE
    converts them to broadcasts at test scale while the plan stays a
    sound shuffle join at 100 TB. Top-100 is TakeOrderedAndProject with
    the unique orderkey tiebreak."""
    li = load(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = load(spark, "orders", sf_dir)
    cust = load(spark, "customer", sf_dir).select("c_custkey", "c_name")
    joined = (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("totalprice_e2"),
            "total_qty",
        )
    )
    return topk(joined, [F.desc("totalprice_e2"), F.asc("o_orderkey")], 100)


@register(
    "part_disjunctive_revenue",
    oracle=f"""
    SELECT CAST((2 * sum({_REV_E4_SQL}) + 100) // 200 AS BIGINT) AS revenue_e2,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'BRAND_3' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'BRAND_12' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'BRAND_21' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def part_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — the disjunctive join: revenue over an OR of
    three (brand x size-range x quantity-band) conjunct groups
    (shipmode/container don't exist in this corpus; brand+size carry
    the part-side arms and quantity the lineitem-side arm).

    Plan notes: the Q19 optimizer test is extracting the
    common-to-all-disjuncts predicates so they push below the join even
    though the full OR straddles both tables. Catalyst does exactly
    this (CNF conversion): part gets `size BETWEEN 1 AND 15 AND brand
    IN (...)` at its scan, lineitem gets `quantity BETWEEN 1 AND 30`,
    and only the residual OR evaluates post-join. The pruned part side
    broadcasts; a single scalar row comes out. This query exists
    precisely to pin that pushdown — the plan-audit test asserts the
    scans carry PushedFilters."""
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & qty.between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(
            arm("BRAND_3", 5, 1, 11)
            | arm("BRAND_12", 10, 10, 20)
            | arm("BRAND_21", 15, 20, 30)
        )
        .agg(
            F.sum(_rev_e4()).alias("_rev_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(_e4_to_e2("_rev_e4").alias("revenue_e2"), "n_lines")
    )


@register(
    "qualified_part_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l.l_suppkey, l.l_partkey,
               sum(CAST(l_quantity AS BIGINT)) AS qty
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'red%')
        GROUP BY 1, 2
        HAVING sum(CAST(l_quantity AS BIGINT)) > 75
    )
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM shipped)
    ORDER BY s_name
    """,
)
def qualified_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — the nested aggregate-threshold semijoin chain:
    suppliers who moved more than a threshold quantity of any red part
    in 1996 (availqty doesn't exist without partsupp; a fixed threshold
    over the same per-(supplier, part) shipped-quantity aggregate
    preserves the chain: filter part -> semijoin lineitem -> aggregate
    -> threshold -> semijoin supplier).

    Plan notes: the part name filter prunes ~5% of parts and broadcasts
    as a LEFT SEMI into lineitem (no supplier fan-out — semijoin keeps
    lineitem's row identity); the (suppkey, partkey) aggregate is
    map-side-combinable; the final IN collapses to a distinct suppkey
    list small enough to broadcast-semijoin into supplier. Nothing
    after the first aggregate touches more than |qualifying suppliers|
    rows."""
    red_parts = (
        load(spark, "part", sf_dir)
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    qualified = (
        li.join(
            F.broadcast(red_parts),
            li.l_partkey == red_parts.p_partkey,
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 75)
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, "supplier", sf_dir)
    nation = load(spark, "nation", sf_dir)
    return (
        supp.join(qualified, supp.s_suppkey == qualified.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@register(
    "min_cost_part_suppliers",
    oracle="""
    WITH class_parts AS (
        SELECT p_partkey, p_name
        FROM part WHERE p_type = 'STANDARD' AND p_size <= 15
    ),
    euro_supp AS (
        SELECT s.s_suppkey
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    bridge AS (
        SELECT l.l_partkey, l.l_suppkey,
               min(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS cost_e2
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM class_parts)
          AND l.l_suppkey IN (SELECT s_suppkey FROM euro_supp)
        GROUP BY 1, 2
    ),
    best AS (
        SELECT l_partkey, l_suppkey, cost_e2,
               min(cost_e2) OVER (PARTITION BY l_partkey) AS min_cost
        FROM bridge
    )
    SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_e2,
           s.s_name, n.n_name AS nation,
           b.l_partkey AS p_partkey, cp.p_name, b.cost_e2
    FROM best b
    JOIN supplier s    ON b.l_suppkey = s.s_suppkey
    JOIN nation n      ON s.s_nationkey = n.n_nationkey
    JOIN class_parts cp ON b.l_partkey = cp.p_partkey
    WHERE b.cost_e2 = b.min_cost
    ORDER BY acctbal_e2 DESC, nation, s_name, p_partkey
    LIMIT 100
    """,
)
def min_cost_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the correlated min-cost-supplier subquery: for
    every part in a size/type class, the EUROPE supplier(s) offering it
    at the minimum cost, ranked by account balance. The corpus has no
    partsupp, so lineitem is the part-supplier bridge and "supply cost"
    is the cheapest line price (cents) that supplier ever charged for
    that part — deterministic, integer-exact, and correlated per part
    exactly like ps_supplycost.

    Plan notes: Q2's classic trap is evaluating the correlated min as a
    second scan of the bridge joined back on (partkey, cost). Here the
    bridge is built ONCE — lineitem pruned by two broadcast semijoins
    (class parts, EUROPE suppliers) then aggregated per (part, supp) —
    and the correlated min rides a partkey window over that aggregate:
    the window's shuffle reuses rows already in hand, no re-scan, no
    self-join. partkey is high-cardinality so the window parallelizes;
    supplier/nation/part attributes attach AFTER the filter has cut the
    frame to |qualifying (part, supplier)| rows. All ties on the min
    survive, as in Q2; the sort (acctbal desc, nation, name, partkey)
    is total because (partkey, suppkey) is the bridge's key. Top-100
    compiles to TakeOrderedAndProject."""
    from pyspark.sql.window import Window

    class_parts = (
        load(spark, "part", sf_dir)
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
        .select("p_partkey", "p_name")
    )
    nation = load(spark, "nation", sf_dir)
    region = load(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    euro_nations = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey")
    euro_supp = (
        load(spark, "supplier", sf_dir)
        .join(F.broadcast(euro_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = load(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    bridge = (
        li.join(
            F.broadcast(class_parts.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "cost_e2"
            )
        )
    )
    w = Window.partitionBy("l_partkey")
    best = bridge.withColumn("min_cost", F.min("cost_e2").over(w)).filter(
        F.col("cost_e2") == F.col("min_cost")
    )
    supp = load(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    joined = (
        best.join(supp, best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(class_parts), best.l_partkey == class_parts.p_partkey)
        .select(
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_e2"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "cost_e2",
        )
    )
    return topk(
        joined,
        [F.desc("acctbal_e2"), F.asc("nation"), F.asc("s_name"), F.asc("p_partkey")],
        100,
    )


@register(
    "discount_band_revenue",
    oracle="""
    SELECT CAST((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_discount * 100) AS BIGINT))
                 + 100) // 200 AS BIGINT) AS discount_revenue_e2,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04999 AND 0.07001
      AND l_quantity < 24
    """,
)
def discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — the single-scan conditional aggregate: revenue
    that would be recovered by eliminating a band of discounts (5-7%)
    on small-quantity lines shipped in one year. The forecasting query:
    no join, no group — the whole plan is scan + filter + one global
    sum, the purest pushdown test in the suite.

    Plan notes: all three predicates are plain column-vs-literal ranges
    so every one reaches the parquet scan as a PushedFilter (the
    discount band uses widened literals 0.04999/0.07001 rather than
    round(x*100) arithmetic precisely so the filter stays pushable and
    engine-exact on discrete 2dp double values); the projection prunes
    to the four referenced columns. The aggregate is a map-side partial
    sum into a 1-row exchange. Per-row revenue-at-discount is exact
    integer e4 (cents x discount percent), halved-up to e2 once."""
    li = load(spark, "lineitem", sf_dir)
    disc_rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        F.col("l_discount") * 100
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.04999, 0.07001)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev_e4).alias("_rev_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(_e4_to_e2("_rev_e4").alias("discount_revenue_e2"), "n_lines")
    )


@register(
    "late_shipment_priority_counts",
    oracle="""
    SELECT l.l_returnflag,
           CAST(count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 END) AS BIGINT) AS high_line_count,
           CAST(count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                           THEN 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A', 'R')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
    GROUP BY 1
    ORDER BY l_returnflag
    """,
)
def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — shipmode two-way conditional counts: for each
    of two shipping classes, how many late lines carried critical
    (urgent/high) vs non-critical orders. The corpus has no l_shipmode
    or commit/receipt dates; l_returnflag IN ('A','R') carries the
    two-class IN filter and "late" is a ship lag over 75 days past the
    order date — which upgrades Q12's within-lineitem date comparison
    into a join-straddling residual, the harder variant of the same
    shape.

    Plan notes: the IN-list and the ship-year range push to the
    lineitem scan; the lag predicate references both tables so it
    evaluates as a residual on the orderkey join, not a scan filter —
    the plan must still push the single-table conjuncts below (the Q12
    optimizer test). Both CASE-counts ride ONE aggregate pass over the
    2-value group key; count(CASE WHEN..THEN 1 END) keeps both engines
    in BIGINT (DuckDB's sum(int) would widen to HUGEINT). The
    fixed-cardinality groupBy is safe because it sits ABOVE the joins'
    partial aggregation — map-side combine collapses each partition to
    <=2 rows before the final 2-row exchange."""
    li = load(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag").isin(["A", "R"])
        & (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    critical = F.col("o_orderpriority").isin(["1-URGENT", "2-HIGH"])
    return (
        orders.join(li, F.col("o_orderkey") == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 75 DAY"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(critical, 1)).alias("high_line_count"),
            F.count(F.when(~critical, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
