"""End-to-end hybrid retrieval pipeline — lexical BM25 + dense ANN with
pseudo-relevance feedback, fused by reciprocal rank.

The reference engine's surface stops at relational extraction/validation
(src/, 1,591 LoC); this example composes the retrieval stack the LLM
query families add on top, the way a search/RAG serving job would:

  1. corpus hygiene: the exact-dedup survivor keep-list
     (dedup_exact_survivors) decides which documents are even eligible —
     at 100 TB you filter BEFORE you rank;
  2. lexical arm: BM25 top-k for the fixed query-term set
     (doc_bm25_topk — integer-summed scoring contract);
  3. dense arm with pseudo-relevance feedback: average the embeddings of
     the BM25 top-{PRF_DOCS} into one centroid query (the classic PRF
     move — no human-labeled dense query needed) and run exact cosine
     top-k against the corpus embeddings (llm/similarity
     brute_force_topk; swap in ivf_topk/pq at corpus scale — same
     frame shape);
  4. reciprocal-rank fusion: each doc earns 10^6 div (60 + rank) points
     per list (the ann_rrf_fusion arithmetic — integer, order-exact),
     hybrid top-{FUSED_K} ranks by total;
  5. land the fused list + both arms' lists as parquet.

Every step is a lazy DataFrame transform; actions are the writes and the
report counts. Run:
    python examples/hybrid_retrieval_pipeline.py [--sf-dir DIR] [--output DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.llm.similarity import brute_force_topk
from financial_data_engineering_spark.queries.registry import get
from financial_data_engineering_spark.session import get_spark
from financial_data_engineering_spark.tables import load

#: PRF depth (dense query = centroid of this many lexical hits) and the
#: fused answer size.
PRF_DOCS = 5
FUSED_K = 10
EMB_DIM = 64


def main(sf_dir: str = "/root/testdata/sf0.001", output_dir: str | None = None):
    spark = get_spark("hybrid-retrieval-pipeline")
    output_dir = output_dir or tempfile.mkdtemp(prefix="hybrid_retrieval_")

    # 1. hygiene: only exact-dedup survivors are retrievable
    survivors = get("dedup_exact_survivors").fn(spark, sf_dir).select(
        "doc_id"
    )
    n_docs = load(spark, "documents", sf_dir).count()
    n_survivors = survivors.count()

    # 2. lexical arm (top-25 by contract; the query terms are the
    # BM25_QUERY_TERMS constant)
    bm25 = get("doc_bm25_topk").fn(spark, sf_dir).join(survivors, "doc_id")
    bm25_path = os.path.join(output_dir, "bm25_hits")
    bm25.write.mode("overwrite").parquet(bm25_path)
    bm25 = spark.read.parquet(bm25_path)

    # 3. dense arm: PRF centroid of the lexical top-PRF_DOCS, then exact
    # cosine top-k over the corpus embeddings. The centroid is ONE row —
    # brute_force_topk broadcasts it and the corpus streams map-side.
    emb = load(spark, "embeddings", sf_dir)
    seeds = (
        bm25.orderBy("rank")
        .limit(PRF_DOCS)
        .join(emb, bm25["doc_id"] == emb["vec_id"])
        .select("embedding")
    )
    centroid = seeds.agg(
        F.array(
            *[
                (F.sum(F.col("embedding")[i]) / F.count(F.lit(1))).cast(
                    "float"
                )
                for i in range(EMB_DIM)
            ]
        ).alias("embedding")
    ).select(F.lit(-1).cast("long").alias("vec_id"), "embedding")
    dense = brute_force_topk(
        centroid, emb, k=25, dim=EMB_DIM
    ).withColumnRenamed("neighbor_id", "doc_id")
    dense = dense.join(survivors, "doc_id")
    dense_path = os.path.join(output_dir, "dense_hits")
    dense.write.mode("overwrite").parquet(dense_path)
    dense = spark.read.parquet(dense_path)

    # 4. integer RRF fusion (the ann_rrf_fusion arithmetic)
    pts = F.expr("1000000 div (60 + rank)")
    u = bm25.select("doc_id", pts.alias("pts")).unionByName(
        dense.select("doc_id", pts.alias("pts"))
    )
    w = Window.orderBy(F.desc("rrf_e6"), F.asc("doc_id"))
    fused = (
        u.groupBy("doc_id")
        .agg(F.sum("pts").alias("rrf_e6"), F.count(F.lit(1)).alias("n_lists"))
        .orderBy(F.desc("rrf_e6"), F.asc("doc_id"))
        .limit(FUSED_K)
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "rrf_e6", "n_lists")
    )
    fused_path = os.path.join(output_dir, "fused_hits")
    fused.write.mode("overwrite").parquet(fused_path)
    fused_rows = spark.read.parquet(fused_path).collect()

    both = [r for r in fused_rows if r["n_lists"] == 2]
    report = {
        "n_docs": n_docs,
        "n_survivors": n_survivors,
        "n_bm25_hits": bm25.count(),
        "n_dense_hits": dense.count(),
        "n_fused": len(fused_rows),
        "n_in_both_lists": len(both),
        "fused_ranks_contiguous": sorted(r["rank"] for r in fused_rows)
        == list(range(1, len(fused_rows) + 1)),
        "output_dir": output_dir,
    }
    for k, v in report.items():
        print(f"{k}: {v}")
    return report


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    main(args.sf_dir, args.output)
