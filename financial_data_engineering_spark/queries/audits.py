"""Corpus-profile audit queries (round-5 additions): sketch-based segment
overlap and embedding-space cohesion. Registered early — the driver's
correctness gate checks a bounded window of the registry, and new families
belong inside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

from financial_data_engineering_spark.queries.similarity_oracles import (
    IVF_ORACLE,
    LSH_ORACLE,
    _N_PLANES,
    _N_QUERIES,
    _TOP_K,
)

# k matches queries.sketch's sketches; the hash-domain scale derives from
# the registration-free operators module. queries.sketch itself is NOT
# imported here — importing a registering query module would fire its
# registrations ahead of this module's and scramble the gate window.
from financial_data_engineering_spark.operators.sketch import KMV_HASH_BITS

KMV_K = 256
_SCALE = 1 << KMV_HASH_BITS
_NUM = (KMV_K - 1) * _SCALE

#: fixed-point scale for embedding components (see overflow note below).
EMB_SCALE = 1000
#: embedding dimensionality of the test corpus.
EMB_DIM = 64


@register(
    "kmv_priority_intersect",
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT o_orderpriority AS grp,
               ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    ),
    bottom AS (
        SELECT grp, h FROM (
            SELECT grp, h,
                   row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM hashes
        ) WHERE rn <= {KMV_K}
    ),
    u AS (
        SELECT DISTINCT h FROM bottom ORDER BY h LIMIT {KMV_K}
    ),
    tk AS (SELECT max(h) AS kth, count(*) AS k_actual FROM u),
    i AS (
        SELECT count(*) AS n_inter FROM u
        WHERE h IN (SELECT h FROM bottom WHERE grp = '1-URGENT')
          AND h IN (SELECT h FROM bottom WHERE grp = '2-HIGH')
    ),
    est AS (
        SELECT n_inter, k_actual,
               CASE WHEN k_actual < {KMV_K} THEN k_actual
                    ELSE {_NUM} // greatest(kth, 1) END AS ue
        FROM tk, i
    )
    SELECT '1-URGENT' AS group_a,
           '2-HIGH' AS group_b,
           CAST(n_inter AS BIGINT) AS inter_sketch_keys,
           CAST(ue AS BIGINT) AS union_estimate,
           CAST((n_inter * ue) // greatest(k_actual, 1) AS BIGINT)
               AS inter_estimate,
           CAST((2 * n_inter * 10000 + k_actual)
                // (2 * greatest(k_actual, 1)) AS BIGINT) AS jaccard_e4
    FROM est
    """,
)
def kmv_priority_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-operation estimator (operators.sketch.kmv_intersection):
    how many customers do the URGENT and HIGH priority segments share,
    estimated from two bottom-k sketches plus their union sketch — no
    exact distinct-join over the raw keys. The Jaccard and intersection
    estimates are integer-exact replays of the Beyer et al. SIGMOD'07
    construction, so the oracle pins estimator arithmetic, not just
    row counts."""
    from financial_data_engineering_spark.operators.sketch import (
        kmv_intersection,
    )

    return kmv_intersection(
        load(spark, "orders", sf_dir),
        "o_orderpriority",
        "o_custkey",
        "1-URGENT",
        "2-HIGH",
        KMV_K,
    )


@register(
    "embedding_label_centroids",
    oracle=f"""
    WITH comp AS (
        SELECT label, d,
               CAST(round(CAST(embedding[d + 1] AS DOUBLE) * {EMB_SCALE})
                    AS BIGINT) AS x
        FROM '__EMB__', (SELECT unnest(range({EMB_DIM})) AS d)
    ),
    per_dim AS (
        SELECT label, d,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM comp GROUP BY label, d
    ),
    vecs AS (SELECT label, count(*) AS n_vecs
             FROM '__EMB__' GROUP BY label)
    SELECT CAST(p.label AS BIGINT) AS label,
           CAST(v.n_vecs AS BIGINT) AS n_vecs,
           CAST(sum(p.sx * p.sx) AS BIGINT) AS sumvec_sq_norm_e6,
           CAST(sum(p.sxx) AS BIGINT) AS total_sq_norm_e6
    FROM per_dim p JOIN vecs v USING (label)
    GROUP BY p.label, v.n_vecs
    ORDER BY label
    """.replace(
        "'__EMB__'", "embeddings"
    ),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space cohesion audit per label: fixed-point (e3) integer
    sums per dimension give the squared norm of each label's SUM vector
    (``sumvec_sq_norm_e6``) next to the summed squared norms of its
    members (``total_sq_norm_e6``). Their ratio — ||Σv||²/(n·Σ||v||²) — is
    the classic cohesion statistic (1 for identical vectors, ~0 for
    isotropic noise), and both numerators are order-independent integer
    sums, so any engine replays them bit-for-bit.

    Plan: one posexplode (dim × rows, map-side) into two hash aggregates
    keyed (label, dim) then (label) — partial aggregation makes the first
    shuffle carry |labels|·dim rows. Headroom: e3 components keep
    per-dim sums inside int64 up to ~10^12 vectors per label.
    """
    emb = load(spark, "embeddings", sf_dir)
    comp = emb.select(
        "label", F.posexplode("embedding").alias("d", "xf")
    ).select(
        "label",
        "d",
        F.round(F.col("xf").cast("double") * EMB_SCALE).cast("long").alias("x"),
    )
    per_dim = comp.groupBy("label", "d").agg(
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        per_dim.groupBy("label")
        .agg(
            (F.sum("n_rows") / EMB_DIM).cast("long").alias("n_vecs"),
            F.sum(F.col("sx") * F.col("sx")).alias("sumvec_sq_norm_e6"),
            F.sum("sxx").alias("total_sq_norm_e6"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            "sumvec_sq_norm_e6",
            "total_sq_norm_e6",
        )
        .orderBy("label")
    )


@register(
    "user_rolling_value_7d",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS rolling_value_e2,
           CAST(count(*) OVER w AS BIGINT) AS rolling_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def user_rolling_value_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day per-user activity (RANGE-frame window — the frame
    class none of the row_number/rank queries exercise): every event
    carries the sum of its user's value and event count over the
    preceding 7 calendar days INCLUSIVE of timestamp peers, which is what
    RANGE (not ROWS) frames guarantee on both engines. Value sums are
    exact integer cents. One shuffle on user_id; the frame scan is a
    per-partition sliding aggregate, linear per user, no self-join — the
    shape that replaces the classic "event × trailing-window self-join"
    anti-pattern at 100 TB."""
    ev = load(spark, "events", sf_dir)
    from pyspark.sql.window import Window

    # unix_micros, not cast-to-seconds: the events table carries
    # microsecond timestamps, and DuckDB's INTERVAL frame compares at
    # full precision — second-truncated ordering keys would disagree for
    # rows within 1 s of the 7-day boundary.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .over(w)
            .alias("rolling_value_e2"),
            F.count(F.lit(1)).over(w).alias("rolling_events"),
        )
        .orderBy("event_id")
    )


@register(
    "lineitem_quantity_mad_outliers",
    oracle="""
    WITH q AS (
        SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q FROM lineitem
    ),
    med AS (
        SELECT l_returnflag, median(CAST(q AS DOUBLE)) AS med
        FROM q GROUP BY l_returnflag
    ),
    dev AS (
        SELECT q.l_returnflag, q.q, m.med, abs(q.q - m.med) AS dev
        FROM q JOIN med m USING (l_returnflag)
    ),
    mad AS (
        SELECT l_returnflag, median(dev) AS mad FROM dev GROUP BY l_returnflag
    )
    SELECT d.l_returnflag,
           count(*) AS n_rows,
           any_value(d.med) AS med_qty,
           any_value(m.mad) AS mad_qty,
           CAST(sum(CASE WHEN d.dev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (l_returnflag)
    GROUP BY d.l_returnflag
    ORDER BY d.l_returnflag
    """,
)
def lineitem_quantity_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier audit: median absolute deviation of
    integer quantities per return flag, plus the count of rows beyond the
    3×MAD fence. Medians over integer-valued data are k or k+0.5 (and
    deviations k/4 steps) — exactly representable doubles, so both
    engines agree bit-for-bit without any rounding column. Two grouped
    exact-median passes plus one broadcast of the tiny per-group stats;
    at 100 TB swap median() for percentile_approx and keep the plan.
    """
    li = load(spark, "lineitem", sf_dir)
    q = li.select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    med = q.groupBy("l_returnflag").agg(
        F.median(F.col("q").cast("double")).alias("med")
    )
    dev = q.join(F.broadcast(med), "l_returnflag").withColumn(
        "dev", F.abs(F.col("q") - F.col("med"))
    )
    mad = dev.groupBy("l_returnflag").agg(F.median("dev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.any_value(F.col("med")).alias("med_qty"),
            F.any_value(F.col("mad")).alias("mad_qty"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("l_returnflag")
    )


_RRF_ORACLE = f"""
WITH lsh AS ({LSH_ORACLE}),
ivf AS ({IVF_ORACLE}),
u AS (
    SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS pts FROM lsh
    UNION ALL
    SELECT query_id, neighbor_id, 1000000 // (60 + rank) AS pts FROM ivf
),
fused AS (
    SELECT query_id, neighbor_id, CAST(sum(pts) AS BIGINT) AS rrf_e6
    FROM u GROUP BY query_id, neighbor_id
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY rrf_e6 DESC, neighbor_id) AS rank
    FROM fused
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, rrf_e6
FROM ranked WHERE rank <= {_TOP_K}
ORDER BY query_id, rank
"""


@register("ann_rrf_fusion", oracle=_RRF_ORACLE)
def ann_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two ANN retrievers: each (query,
    neighbor) earns ``10⁶ div (60 + rank)`` points from every retriever
    list it appears in (LSH buckets and IVF probes — different recall
    failure modes, which is why fused retrieval beats either alone), and
    the fused top-k ranks by total points. Integer arithmetic throughout
    (the RRF constant 60 is Cormack et al.'s standard), so the oracle —
    composed verbatim from the two retrievers' full SQL replicas —
    replays fusion exactly. Retriever plans are unchanged; fusion adds
    one small groupBy over the two k·|queries| lists."""
    from financial_data_engineering_spark.llm import similarity as sim
    from pyspark.sql.window import Window

    emb = load(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    lsh = sim.lsh_topk(queries, emb, k=_TOP_K, n_planes=_N_PLANES, dim=64)
    ivf = sim.ivf_topk(
        queries, emb, k=_TOP_K, n_centroids=8, nprobe=2, dim=64, n_iters=2
    )
    pts = F.expr("1000000 div (60 + rank)")
    u = lsh.select("query_id", "neighbor_id", pts.alias("pts")).unionByName(
        ivf.select("query_id", "neighbor_id", pts.alias("pts"))
    )
    fused = u.groupBy("query_id", "neighbor_id").agg(
        F.sum("pts").alias("rrf_e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_e6"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "rank", "neighbor_id", "rrf_e6")
        .orderBy("query_id", "rank")
    )


@register(
    "event_props_rollup",
    oracle=r"""
    WITH k AS (
        SELECT event_type,
               CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '')
                    AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           count(k) AS n_with_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           count(DISTINCT k) AS n_distinct_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM k GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured event properties: parse the JSON ``props`` column
    with a declared schema (``from_json`` — typed extraction inside
    codegen, the engine path for JSON event payloads; the oracle uses a
    regex so it needs no JSON extension) and roll up the extracted field
    per event type. Malformed/missing JSON yields NULL and drops out of
    the aggregates on both engines. One shuffle on event_type; the
    distinct-count rewrites to a two-phase expand, both map-side partial.
    """
    ev = load(spark, "events", sf_dir)
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
