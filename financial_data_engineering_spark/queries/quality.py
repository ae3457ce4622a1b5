"""Quality-rule queries (SURVEY.md §2.I) — the rule compiler's aggregate
plans exposed as oracle-checkable queries.

Each query runs the REAL rule machinery (``Rule.compile`` → fused agg) and
renames the outputs positionally, so the oracle checks the exact expressions
the quality framework executes — not a parallel reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import duplicate_row_count
from financial_data_engineering_spark.quality.rules import PatternRule, RangeRule
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load


@register(
    "quality_freshness_events",
    oracle="""
    SELECT max(ts) AS newest,
           CAST((epoch_us(TIMESTAMP '2024-01-31 00:00:00') - epoch_us(max(ts)))
                // 3600000000 AS BIGINT) AS age_hours_floor
    FROM events
    """,
)
def quality_freshness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FreshnessRule (extension): the compiled max-timestamp aggregate,
    run through the actual rule compiler, plus the whole-hours age
    against a FIXED as_of (deterministic audits — never now()). Age is
    integer floor-division of epoch seconds, engine-exact."""
    from financial_data_engineering_spark.quality.rules import FreshnessRule

    ev = load(spark, "events", sf_dir)
    compiled = FreshnessRule("ts", 48, "2024-01-31 00:00:00").compile(ev)
    # compile() emits [age_microseconds, newest-formatted-in-session-tz];
    # both already UTC-deterministic, so the query only reshapes them.
    return (
        ev.agg(*compiled.exprs)
        .toDF("age_us", "newest_str")
        .select(
            F.to_timestamp("newest_str").alias("newest"),
            F.expr("age_us div 3600000000").alias("age_hours_floor"),
        )
    )

@register(
    "quality_completeness_lineitem",
    oracle="""
    SELECT count(*) AS total_rows,
           CAST(CASE WHEN count(*) = 0 THEN 1000000
                ELSE (2 * count(l_quantity) * 1000000 + count(*))
                     // (2 * count(*)) END AS BIGINT) AS quantity_ratio_e6,
           CAST(CASE WHEN count(*) = 0 THEN 1000000
                ELSE (2 * count(l_extendedprice) * 1000000 + count(*))
                     // (2 * count(*)) END AS BIGINT) AS price_ratio_e6,
           CAST(CASE WHEN count(*) = 0 THEN 1000000
                ELSE (2 * count(l_returnflag) * 1000000 + count(*))
                     // (2 * count(*)) END AS BIGINT) AS returnflag_ratio_e6
    FROM lineitem
    """,
)
def quality_completeness_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CompletenessRule (I1) as a single fused aggregate pass: one scan
    computes every per-column non-null ratio (vs. reference's one pandas
    pass per rule, rules.py:40-75)."""
    li = load(spark, "lineitem", sf_dir)
    agg = li.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.count("l_quantity").alias("_q"),
        F.count("l_extendedprice").alias("_p"),
        F.count("l_returnflag").alias("_r"),
    )
    # half-up e6 completeness ratios via integer div — the repo-standard
    # exact rendering for compared ratio-of-count outputs.
    ratio = (
        "CAST(CASE WHEN total_rows = 0 THEN 1000000"
        " ELSE (2 * {c} * 1000000 + total_rows) div (2 * total_rows)"
        " END AS BIGINT)"
    )
    return agg.select(
        "total_rows",
        F.expr(ratio.format(c="_q")).alias("quantity_ratio_e6"),
        F.expr(ratio.format(c="_p")).alias("price_ratio_e6"),
        F.expr(ratio.format(c="_r")).alias("returnflag_ratio_e6"),
    )


@register(
    "quality_uniqueness_orders",
    oracle="""
    SELECT CAST(coalesce(sum(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS duplicate_rows,
           CAST(coalesce(sum(CASE WHEN n = 1 THEN n END), 0) AS BIGINT) AS unique_rows,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS total_rows
    FROM (SELECT count(*) AS n FROM orders GROUP BY o_orderkey)
    """,
)
def quality_uniqueness_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniquenessRule (I2): duplicated(keep=False) semantics — every member
    of a duplicate key group counts. Two-level aggregation; the inner
    groupBy partial-aggregates map-side, so only |keys| rows shuffle."""
    return duplicate_row_count(load(spark, "orders", sf_dir), ["o_orderkey"])


@register(
    "quality_range_quantity",
    oracle="""
    SELECT count(l_quantity) AS checked,
           CAST(coalesce(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
           min(l_quantity) AS min_found,
           max(l_quantity) AS max_found
    FROM lineitem
    """,
)
def quality_range_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RangeRule (I3) compiled expressions, run through the actual rule
    compiler. Inclusive bounds, nulls/NaN excluded (SURVEY §4 NaN trap)."""
    li = load(spark, "lineitem", sf_dir)
    compiled = RangeRule("l_quantity", min_val=1, max_val=50).compile(li)
    # min/max are passthroughs of integer-valued quantities — no rounding.
    return li.agg(*compiled.exprs).toDF(
        "checked", "violations", "min_found", "max_found"
    )


@register(
    "quality_pattern_customer_name",
    oracle="""
    SELECT count(c_name) AS checked,
           CAST(coalesce(sum(CASE WHEN NOT regexp_matches(c_name, '^(?:Customer#[0-9]+)')
                                  THEN 1 ELSE 0 END), 0) AS BIGINT) AS mismatches
    FROM customer
    """,
)
def quality_pattern_customer_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PatternRule (I4): prefix-anchored regex (pandas str.match semantics,
    rules.py:192 — anchored with ^(?:...), never fully anchored)."""
    cust = load(spark, "customer", sf_dir)
    compiled = PatternRule("c_name", r"Customer#[0-9]+").compile(cust)
    return cust.agg(*compiled.exprs).toDF("checked", "mismatches")
