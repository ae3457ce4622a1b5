"""Multimodal-column query: documents' text payloads wrapped as binary
media, decoded (deterministic fake — see llm/multimodal.py) through the
real mapInPandas plumbing, then rolled up per source. The oracle replays
the md5-nibble fake-decode formula in SQL, so the binary round-trip,
Arrow batch path, and decode math are all pinned by the hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.llm import multimodal as mm
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

_NIB = "(strpos('0123456789abcdef', substr(md5(text), {pos}, 1)) - 1)"


@register(
    "multimodal_decode_stats",
    oracle=f"""
    SELECT source,
           count(*) AS n_media,
           round(sum(16 * (1 + {_NIB.format(pos=1)})) * 1.0 / count(*), 2) AS avg_width,
           round(sum(16 * (1 + {_NIB.format(pos=2)})) * 1.0 / count(*), 2) AS avg_height,
           sum(CASE WHEN {_NIB.format(pos=4)} % 2 = 0 THEN 1 ELSE 0 END) AS n_png
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each document's UTF-8 bytes as a media struct, decode metadata
    in Arrow batches (mapInPandas; deterministic fake decoder), and roll up
    per source. The plan is scan → map-side UDF → one low-cardinality
    shuffle; payload bytes never leave the executors."""
    docs = load(spark, "documents", sf_dir)
    media = docs.select(
        "doc_id",
        "source",
        mm.media_struct(F.encode(F.col("text"), "UTF-8"), "text/plain").alias(
            "media"
        ),
    )
    decoded = mm.decode_media(media, "media")
    # Widths/heights are exact ints: sum them exactly and divide once —
    # avg(double) is partial-aggregation-order dependent and can't be
    # hash-compared across engines.
    return (
        decoded.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(F.sum("width") / F.count(F.lit(1)), 2).alias("avg_width"),
            F.round(F.sum("height") / F.count(F.lit(1)), 2).alias("avg_height"),
            F.sum(F.when(F.col("format") == "png", 1).otherwise(0)).alias("n_png"),
        )
        .orderBy("source")
    )
