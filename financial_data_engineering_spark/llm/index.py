"""IVF index lifecycle: build once, persist, serve queries from disk.

:func:`financial_data_engineering_spark.llm.similarity.ivf_topk` trains
the coarse quantizer and assigns the corpus on every call — right for an
oracle-checked query, wrong for production, where the corpus is 100 TB
and queries arrive continuously. This module splits the lifecycle:

- :func:`build_ivf_index` runs k-means + assignment ONCE and writes two
  artifacts: ``centroids/`` (k rows) and ``lists/`` — the inverted lists
  — PARTITIONED BY CLUSTER, with each vector's L2 norm precomputed.
- :func:`ivf_topk_from_index` loads the k centroids (control-plane),
  assigns the (small, broadcastable) query set to its ``nprobe`` lists,
  and reads ONLY the probed cluster partitions — the ``cluster IN (...)``
  filter prunes at the partition-directory level, so serving cost scales
  with nprobe/n_centroids of the index, not its full size. The scoring
  path and tie-breaks are byte-identical to ``ivf_topk``'s (same
  ``_pair_cos``, same rank window), which the round-trip test pins.

The probed-cluster collect is ≤ |queries|·nprobe ints — control plane by
the same contract that lets the query set broadcast.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.functions.vectors import l2_norm_fixed
from financial_data_engineering_spark.llm.caching import persist_tracked
from financial_data_engineering_spark.llm.similarity import (
    _pair_cos,
    ivf_assignments,
    kmeans_centroids,
)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    n_iters: int = 2,
    dim: int = 64,
) -> None:
    """Train the coarse quantizer and write the IVF index to ``path``."""
    spark = corpus.sparkSession
    proj = persist_tracked(corpus.select(id_col, vec_col))
    centroids = kmeans_centroids(
        proj,
        id_col=id_col,
        vec_col=vec_col,
        n_centroids=n_centroids,
        n_iters=n_iters,
        dim=dim,
    )
    cent_df = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "cluster long, centroid array<double>",
    )
    cent_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "centroids")
    )
    lists = ivf_assignments(
        proj, centroids, id_col=id_col, vec_col=vec_col, dim=dim, nprobe=1
    ).select(
        F.col("id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        l2_norm_fixed("v", dim).alias("cn"),
        "cluster",
    )
    lists.write.mode("overwrite").partitionBy("cluster").parquet(
        os.path.join(path, "lists")
    )


def ivf_topk_from_index(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Serve approximate cosine top-k from a persisted IVF index,
    touching only the probed cluster partitions."""
    centroids = [
        (int(r["cluster"]), list(r["centroid"]))
        for r in spark.read.parquet(os.path.join(path, "centroids")).collect()
    ]
    probes = ivf_assignments(
        queries, centroids, id_col=id_col, vec_col=vec_col, dim=dim, nprobe=nprobe
    ).select(
        F.col("id").alias("query_id"),
        F.col("v").alias("qv"),
        "cluster",
        l2_norm_fixed("v", dim).alias("qn"),
    )
    probes = persist_tracked(probes)
    probed = sorted(
        r["cluster"] for r in probes.select("cluster").distinct().collect()
    )
    lists = spark.read.parquet(os.path.join(path, "lists")).filter(
        F.col("cluster").isin(probed)
    )
    scored = (
        F.broadcast(probes)
        .join(lists, ["cluster"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _pair_cos(dim).alias("cos"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cos")
    )
