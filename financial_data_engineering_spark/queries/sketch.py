"""Approximate-query-processing queries: sketches whose estimators are
deterministic and exactly replayable in SQL, so the oracle can pin them.

``kmv_distinct_customers`` runs the KMV bottom-k sketch (operators/sketch.py)
over the order fact's customer key and reports the estimate NEXT TO the
exact count and the scaled relative error — the accuracy audit is part of
the query surface, not a claim in a docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from financial_data_engineering_spark.operators.sketch import kmv_distinct
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

#: sketch size: expected relative error ~ 1/sqrt(k-1) ≈ 6.3%.
KMV_K = 256
_SCALE = 1 << 48
_NUM = (KMV_K - 1) * _SCALE


@register(
    "kmv_distinct_customers",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        FROM orders WHERE o_custkey IS NOT NULL
    ), tk AS (
        SELECT max(h) AS kth, count(*) AS k_actual
        FROM (SELECT h FROM hashes ORDER BY h LIMIT {KMV_K})
    ), ex AS (
        SELECT count(*) AS n_exact FROM hashes
    ), est AS (
        SELECT n_exact,
               CASE WHEN k_actual < {KMV_K} THEN k_actual
                    ELSE {_NUM} // greatest(kth, 1) END AS e
        FROM tk, ex
    )
    SELECT CAST({KMV_K} AS BIGINT) AS kmv_k,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(e AS BIGINT) AS kmv_estimate,
           CAST(CASE WHEN n_exact > 0 THEN
                    (2 * abs(e - n_exact) * 10000 + n_exact) // (2 * n_exact)
                ELSE 0 END AS BIGINT) AS err_e4
    FROM est
    """,
)
def kmv_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers in the order fact, estimated by the KMV bottom-k
    sketch and audited against the exact distinct in the same row. The
    estimator is pure integer arithmetic over md5-prefix hashes — both
    engines replay it bit-for-bit (sketches with engine-private layouts,
    e.g. HyperLogLog, can't be oracle-checked like this).

    The tk/ex/est CTE structure in the oracle mirrors the operator's
    bottom-k / exact / combine stages one-to-one."""
    return kmv_distinct(load(spark, "orders", sf_dir), "o_custkey", KMV_K)


@register(
    "kmv_priority_union",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT o_orderpriority AS grp,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        FROM orders WHERE o_custkey IS NOT NULL
    ),
    bottom AS (
        SELECT grp, h FROM hashes
        QUALIFY row_number() OVER (PARTITION BY grp ORDER BY h) <= {KMV_K}
    ),
    per_group AS (
        SELECT grp, max(h) AS kth, count(*) AS k_actual
        FROM bottom GROUP BY grp
    ),
    merged AS (
        SELECT '__ALL__' AS grp, max(h) AS kth, count(*) AS k_actual
        FROM (SELECT DISTINCT h FROM bottom ORDER BY h LIMIT {KMV_K})
    ),
    combined AS (
        SELECT * FROM per_group UNION ALL SELECT * FROM merged
    )
    SELECT grp AS o_orderpriority,
           CAST(k_actual AS BIGINT) AS k_actual,
           CAST(CASE WHEN k_actual < {KMV_K} THEN k_actual
                ELSE {_NUM} // greatest(kth, 1) END AS BIGINT) AS kmv_estimate
    FROM combined
    ORDER BY o_orderpriority
    """,
)
def kmv_priority_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable sketches: per-priority KMV sketches of the distinct
    customer set, and the '__ALL__' row merged from ONLY the per-group
    bottom-k rows — never rescanning the fact. Customer sets overlap
    heavily across priorities, so the merge exercises sketch-union
    dedup (same key → same hash everywhere), the property that lets
    100 TB profile jobs build per-partition sketches and combine them
    driver-side or in a reduce tree."""
    from financial_data_engineering_spark.operators.sketch import (
        kmv_group_sketches,
    )

    return kmv_group_sketches(
        load(spark, "orders", sf_dir), "o_orderpriority", "o_custkey", KMV_K
    )


_CM_W = 4
_CM_D = 2
_CM_P = 4294967311  # MINHASH_P


@register(
    "event_type_cm_audit",
    oracle=f"""
    WITH hashed AS (
        SELECT event_type AS item,
               ('0x' || substr(md5(event_type), 1, 8))::BIGINT AS a,
               ('0x' || substr(md5(event_type), 9, 8))::BIGINT AS b
        FROM events
    ),
    cells AS (
        SELECT d.i AS row,
               ((a + (d.i + 1) * b) % {_CM_P}) % {_CM_W} AS col,
               count(*) AS cnt
        FROM hashed CROSS JOIN (SELECT unnest(range({_CM_D})) AS i) d
        GROUP BY 1, 2
    ),
    items AS (
        SELECT item, count(*) AS true_count,
               any_value(a) AS a, any_value(b) AS b
        FROM hashed GROUP BY item
    ),
    est AS (
        SELECT it.item, it.true_count, min(c.cnt) AS cm_estimate
        FROM items it
        CROSS JOIN (SELECT unnest(range({_CM_D})) AS i) d
        JOIN cells c
          ON c.row = d.i
         AND c.col = ((it.a + (d.i + 1) * it.b) % {_CM_P}) % {_CM_W}
        GROUP BY 1, 2
    )
    SELECT item AS event_type,
           CAST(true_count AS BIGINT) AS true_count,
           CAST(cm_estimate AS BIGINT) AS cm_estimate,
           CAST(cm_estimate - true_count AS BIGINT) AS overestimate
    FROM est
    ORDER BY event_type
    """,
)
def event_type_cm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch audit (operators/countmin.py): event-type
    frequencies estimated from a deliberately UNDERSIZED counter matrix
    (width 4 < |types|, depth 2 — the _CM_W/_CM_D constants above;
    collisions by construction) next to exact counts, so the
    never-undercount guarantee and the actual overestimate paid are both
    visible. The md5-affine family makes every counter DuckDB-replayable;
    the probe side is map-side literal arithmetic over the collected
    (control-plane, w·d-row) table. At scale this is the "never miss a
    ceiling breach" complement to the Misra-Gries never-overcount
    summary."""
    from pyspark.sql import functions as F

    from financial_data_engineering_spark.operators.countmin import (
        count_min_build,
        count_min_estimate,
    )

    events = load(spark, "events", sf_dir)
    cm = count_min_build(events, "event_type", width=_CM_W, depth=_CM_D)
    exact = events.groupBy(
        F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("true_count"))
    return (
        count_min_estimate(exact, cm, "event_type", width=_CM_W, depth=_CM_D)
        .select(
            "event_type",
            "true_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_count")).alias(
                "overestimate"
            ),
        )
        .orderBy("event_type")
    )
