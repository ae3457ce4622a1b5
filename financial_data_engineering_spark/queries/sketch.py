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
    engines replay it bit-for-bit (hll_distinct_orders does the same for
    HLL by pinning its layout and estimator order explicitly).

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


def _hll_oracle_fragments() -> dict[str, str]:
    """DuckDB renderings of the shared HLL expression fragments
    (operators/hll.py) — same constants, same evaluation order."""
    from financial_data_engineering_spark.operators import hll as H

    rho = H.RHO_SQL.format(bitlen=f"bin(h % {H.HLL_W_MOD})")
    raw = H.EST_RAW_SQL.format(div="//")
    return {
        "rho": rho,
        "raw": raw,
        "lc": H.EST_LC_SQL,
        "w_mod": str(H.HLL_W_MOD),
        "m": str(H.HLL_M),
        "rmax": str(H.HLL_RMAX),
        "thresh": str(H.HLL_LC_THRESHOLD),
    }


def _hll_est_ctes(f: dict[str, str]) -> str:
    """The register→estimate CTE chain, shared by both HLL oracles;
    expects a ``regs(grp, bucket, reg)`` CTE upstream. Sums are cast
    back to BIGINT (DuckDB promotes to HUGEINT, which the driver's
    dtype-sensitive hash would flag)."""
    return f"""
    agg AS (
        SELECT grp, count(*) AS n_present,
               CAST(sum(CAST(1 AS BIGINT) << ({f["rmax"]} - reg)) AS BIGINT)
                   AS s_present
        FROM regs GROUP BY grp
    ),
    sv AS (
        SELECT grp, ({f["m"]} - n_present) AS v_zero,
               CAST(s_present + ({f["m"]} - n_present)
                    * (CAST(1 AS BIGINT) << {f["rmax"]}) AS BIGINT) AS s
        FROM agg
    ),
    fin AS (
        SELECT grp,
               CASE WHEN ({f["raw"]}) <= {f["thresh"]} AND v_zero > 0
                    THEN {f["lc"]}
                    ELSE CAST(({f["raw"]}) AS BIGINT) END AS hll_estimate
        FROM sv
    )"""


def _hll_distinct_orders_oracle() -> str:
    f = _hll_oracle_fragments()
    return f"""
    WITH hashes AS (
        SELECT DISTINCT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT AS h
        FROM orders WHERE o_orderkey IS NOT NULL
    ),
    regs AS (
        SELECT 1 AS grp, h // {f["w_mod"]} AS bucket,
               max({f["rho"]}) AS reg
        FROM hashes GROUP BY 1, 2
    ),
    {_hll_est_ctes(f)},
    ex AS (SELECT count(*) AS n_exact FROM hashes)
    SELECT CAST({f["m"]} AS BIGINT) AS hll_m,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(hll_estimate AS BIGINT) AS hll_estimate,
           CAST(CASE WHEN n_exact > 0 THEN
                    (2 * abs(hll_estimate - n_exact) * 10000 + n_exact)
                    // (2 * n_exact)
                ELSE 0 END AS BIGINT) AS err_e4
    FROM fin, ex
    """


def _hll_priority_union_oracle() -> str:
    f = _hll_oracle_fragments()
    return f"""
    WITH hashes AS (
        SELECT DISTINCT o_orderpriority AS grp,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT AS h
        FROM orders WHERE o_orderkey IS NOT NULL
    ),
    pregs AS (
        SELECT grp, h // {f["w_mod"]} AS bucket,
               max({f["rho"]}) AS reg
        FROM hashes GROUP BY 1, 2
    ),
    regs AS (
        SELECT * FROM pregs
        UNION ALL
        SELECT '__ALL__' AS grp, bucket, max(reg) FROM pregs GROUP BY 2, 1
    ),
    {_hll_est_ctes(f)},
    ex AS (
        SELECT grp, count(*) AS n_exact FROM hashes GROUP BY 1
        UNION ALL
        SELECT '__ALL__', count(DISTINCT h) FROM hashes
    )
    SELECT fin.grp AS o_orderpriority,
           CAST({f["m"]} AS BIGINT) AS hll_m,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(hll_estimate AS BIGINT) AS hll_estimate,
           CAST(CASE WHEN n_exact > 0 THEN
                    (2 * abs(hll_estimate - n_exact) * 10000 + n_exact)
                    // (2 * n_exact)
                ELSE 0 END AS BIGINT) AS err_e4
    FROM fin JOIN ex ON fin.grp = ex.grp
    ORDER BY o_orderpriority
    """


@register("hll_distinct_orders", oracle=_hll_distinct_orders_oracle())
def hll_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct orders estimated by the integer-contract HyperLogLog
    (operators/hll.py), audited against the exact distinct in the same
    row — the kmv_distinct_customers shape, so the two sketch families
    read side by side. This entry retires the old claim that HLL can't
    be oracle-checked: with the register layout and estimator order
    pinned (and linear counting's 255-value ln domain exhaustively
    verified cross-engine in tests), DuckDB replays it bit-for-bit.

    One shuffle to the ≤m-row register table; the exact count rides the
    same distinct-hash pass and attaches as a broadcast scalar."""
    from financial_data_engineering_spark.operators.hll import hll_distinct

    return hll_distinct(load(spark, "orders", sf_dir), "o_orderkey")


@register("hll_priority_union", oracle=_hll_priority_union_oracle())
def hll_priority_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority HLL register tables and their element-wise-max merge
    ('__ALL__'), each audited against its exact count. The merge is the
    100 TB property: registers are FIXED SIZE (m = 256 per group) and
    combine in a reduce tree with no resort, so the merged row is built
    from m·|groups| register rows alone — never rescanning the fact —
    and equals the single global sketch exactly.

    The per-priority sets (~300 keys at sf0.001) exercise the linear-
    counting branch while the merged set (~1500) takes the raw
    estimator — both correction regimes gate at every scale factor."""
    from financial_data_engineering_spark.operators.hll import hll_group_union

    return hll_group_union(
        load(spark, "orders", sf_dir), "o_orderpriority", "o_orderkey"
    ).orderBy("o_orderpriority")
