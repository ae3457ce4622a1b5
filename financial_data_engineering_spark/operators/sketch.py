"""KMV (k-minimum-values) distinct-count sketch.

The reference engine counts distincts exactly (src/quality/validator.py
uniqueness rule; SURVEY.md §2.D4). At the 100 TB tier an exact global
distinct is often the single most expensive aggregate in a profile job, so
this module adds the classic bottom-k sketch as a first-class operator: hash
every key to a uniform 48-bit integer, keep the k smallest DISTINCT hash
values, and estimate the cardinality as ``(k-1) / R_k`` where ``R_k`` is the
k-th smallest hash normalized to [0, 1) (Bar-Yossef et al. 2002,
Beyer et al. "On Synopses for Distinct-Value Estimation" SIGMOD'07).

Unlike off-the-shelf HyperLogLog (whose register layout and float
corrections differ per implementation), KMV is trivially replayable in ANSI
SQL — md5 prefix, sort, limit, one integer division — so the DuckDB oracle
pins the estimator bit-for-bit. (operators/hll.py shows the same can be
done for HLL by pinning the layout and estimator order explicitly.) All arithmetic is integer: the estimate is
``(k-1)·2^48 div h_k``, no doubles anywhere.

Scale design: the only shuffle is the hash-distinct, whose volume is bounded
by the number of DISTINCT keys (HashAggregate dedups map-side), i.e. the
same bound ``count(DISTINCT x)`` pays — and this operator reports that exact
count alongside the estimate for accuracy auditing. A pure sketch pass that
never shuffles the key set (per-partition bottom-k + driver merge, or a
pre-filter ``h < threshold`` from a prior estimate) keeps the same estimator
arithmetic; use it when the exact count is not wanted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_engineering_spark.partitioning import materialize

#: hash domain: first 12 hex chars of md5 = 48 uniform bits. 2^48 keeps
#: (k-1)·2^48 far inside BIGINT for any practical k (k ≤ ~32000).
KMV_HASH_BITS = 48
_SCALE = 1 << KMV_HASH_BITS


def kmv_hash(col: F.Column) -> F.Column:
    """Uniform 48-bit integer hash of a key (md5-prefix family — the same
    public construction every dedup family in llm/dedup.py uses)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row frame: ``kmv_k``, ``n_exact`` (exact distinct, for audit),
    ``kmv_estimate`` (the sketch), ``err_e4`` (half-up scaled relative
    error |est−exact|/exact × 10⁴). NULL keys are excluded, matching
    ``count(DISTINCT col)``. When fewer than k distinct keys exist the
    sketch holds them all and the estimate IS the exact count.
    """
    hashes = (
        df.where(F.col(col).isNotNull())
        .select(kmv_hash(F.col(col)).alias("h"))
        .distinct()
    )
    return kmv_distinct_from_hashes(hashes, k)


def kmv_distinct_from_hashes(hashes: DataFrame, k: int = 256) -> DataFrame:
    """The estimator over an already-hashed distinct ``h`` frame — shared
    by :func:`kmv_distinct` and the streaming twin's merged per-shard
    snapshots (streaming/stateful.py ``running_kmv_distinct``), so the
    batch and stream paths are the SAME arithmetic; KMV's
    order-independence makes the two estimates bit-identical over equal
    key sets (pinned by test)."""
    bottom_k = (
        hashes.orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_actual"))
    )
    exact = hashes.agg(F.count(F.lit(1)).alias("n_exact"))
    # Combine the two one-row aggregates without a join: pad columns, union,
    # fold with max (each column is non-null in exactly one input row).
    stats = (
        bottom_k.select(
            "kth", "k_actual", F.lit(None).cast("long").alias("n_exact")
        )
        .unionByName(
            exact.select(
                F.lit(None).cast("long").alias("kth"),
                F.lit(None).cast("long").alias("k_actual"),
                "n_exact",
            )
        )
        .agg(
            F.max("kth").alias("kth"),
            F.max("k_actual").alias("k_actual"),
            F.max("n_exact").alias("n_exact"),
        )
    )
    est = (
        f"CASE WHEN k_actual < {k} THEN k_actual "
        f"ELSE {(k - 1) * _SCALE} div greatest(kth, 1) END"
    )
    return stats.select(
        F.lit(k).cast("bigint").alias("kmv_k"),
        F.col("n_exact").cast("bigint").alias("n_exact"),
        F.expr(est).cast("bigint").alias("kmv_estimate"),
        F.expr(
            f"CASE WHEN n_exact > 0 THEN"
            f" (2 * abs(({est}) - n_exact) * 10000 + n_exact)"
            f" div (2 * n_exact) ELSE 0 END"
        )
        .cast("bigint")
        .alias("err_e4"),
    )


def kmv_group_sketches(
    df: DataFrame, group_col: str, key_col: str, k: int = 256
) -> DataFrame:
    """Per-group KMV sketches PLUS their merge — the property that makes
    bottom-k sketches the right distinct-counter at 100 TB: each group's
    sketch is its k smallest distinct hashes, and the UNION's sketch is
    just the bottom-k of the concatenated per-group sketches — k·|groups|
    rows, no second pass over the raw data. The merged row (group =
    '__ALL__') here is computed exactly that way, so overlapping groups
    dedupe correctly (same key → same hash on every partition, node, or
    engine).

    Output: one row per group plus '__ALL__', each with ``k_actual``
    (sketch fill) and the integer estimate ``(k-1)·2^48 div h_k``
    (= k_actual when the sketch isn't full, i.e. exact)."""
    from pyspark.sql.window import Window

    hashes = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"), kmv_hash(F.col(key_col)).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    # Materialize the per-group sketches once: both consumers (the
    # per-group rows and the merge) read this k·|groups|-row frame, and
    # without truncation each would re-run the corpus-sized hash-distinct
    # lineage. This materialize() IS the "store the partial sketches"
    # step of a real profile job (reliable off-local — see
    # partitioning.materialize).
    bottom = materialize(
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
    )
    per_group = bottom.groupBy("grp").agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_actual")
    )
    merged = (
        bottom.select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_actual"))
        .select(F.lit("__ALL__").alias("grp"), "kth", "k_actual")
    )
    est = (
        f"CASE WHEN k_actual < {k} THEN k_actual "
        f"ELSE {(k - 1) * _SCALE} div greatest(kth, 1) END"
    )
    return (
        per_group.unionByName(merged)
        .select(
            F.col("grp").alias(group_col),
            F.col("k_actual").cast("bigint").alias("k_actual"),
            F.expr(est).cast("bigint").alias("kmv_estimate"),
        )
        .orderBy(group_col)
    )


def kmv_intersection(
    df: DataFrame,
    group_col: str,
    key_col: str,
    group_a: str,
    group_b: str,
    k: int = 256,
) -> DataFrame:
    """KMV set-operation estimator (Beyer et al. SIGMOD'07 §4): estimate
    the overlap between two groups' DISTINCT key sets from their bottom-k
    sketches alone — the audit a 100 TB profile job runs to ask "how many
    customers do segments A and B share?" without an exact distinct-join.

    Method: build each side's bottom-k sketch, take the union sketch
    (bottom-k of the two sketches' hashes — never the raw data), and count
    the union-sketch hashes present in BOTH sides (``n_inter``). Then
    ρ = n_inter/k estimates the Jaccard of the key sets, and
    ρ · D_union the intersection size, where D_union is the union
    sketch's (k−1)·2^48 div h_k estimate. When the union sketch is not
    full the numbers are exact, not estimates (the sketch holds every
    hash). Integer arithmetic throughout, so a SQL oracle replays it
    bit-for-bit.

    One distinct-shuffle over the (filtered) keys; everything after is
    k-row control-plane data.
    """
    from pyspark.sql.window import Window

    hashes = (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(group_col).isin([group_a, group_b])
        )
        .select(
            F.col(group_col).alias("grp"), kmv_hash(F.col(key_col)).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    bottom = materialize(
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "h")
    )
    union_sketch = materialize(
        bottom.select("h").distinct().orderBy("h").limit(k)
    )
    a_h = bottom.filter(F.col("grp") == group_a).select("h")
    b_h = bottom.filter(F.col("grp") == group_b).select("h")
    inter = union_sketch.join(a_h, "h").join(b_h, "h").agg(
        F.count(F.lit(1)).alias("n_inter")
    )
    stats = union_sketch.agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_actual")
    )
    # Combine the one-row aggregates without a join (pad/union/fold — same
    # trick as kmv_distinct: each column is non-null in exactly one input).
    combined = (
        stats.select(
            "kth", "k_actual", F.lit(None).cast("long").alias("n_inter")
        )
        .unionByName(
            inter.select(
                F.lit(None).cast("long").alias("kth"),
                F.lit(None).cast("long").alias("k_actual"),
                F.col("n_inter").cast("long"),
            )
        )
        .agg(
            F.max("kth").alias("kth"),
            F.max("k_actual").alias("k_actual"),
            F.max("n_inter").alias("n_inter"),
        )
    )
    union_est = (
        f"CASE WHEN k_actual < {k} THEN k_actual "
        f"ELSE {(k - 1) * _SCALE} div greatest(kth, 1) END"
    )
    return combined.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.col("n_inter").cast("bigint").alias("inter_sketch_keys"),
        F.expr(union_est).cast("bigint").alias("union_estimate"),
        F.expr(f"(n_inter * ({union_est})) div greatest(k_actual, 1)")
        .cast("bigint")
        .alias("inter_estimate"),
        F.expr("(2 * n_inter * 10000 + k_actual) div (2 * greatest(k_actual, 1))")
        .cast("bigint")
        .alias("jaccard_e4"),
    )
