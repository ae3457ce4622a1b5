"""Multimodal-column query: documents' text payloads wrapped as binary
media, decoded (deterministic fake — see llm/multimodal.py) through the
real mapInPandas plumbing, then rolled up per source. The oracle replays
the md5-nibble fake-decode formula in SQL, so the binary round-trip,
Arrow batch path, and decode math are all pinned by the hash comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.llm import codecs as _codecs
from financial_data_engineering_spark.llm import multimodal as mm
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

_NIB = "(strpos('0123456789abcdef', substr(md5(text), {pos}, 1)) - 1)"


@register(
    "multimodal_decode_stats",
    oracle=f"""
    WITH agg AS (
        SELECT source,
               count(*) AS n_media,
               sum(CAST(16 * (1 + {_NIB.format(pos=1)}) AS BIGINT)) AS wsum,
               sum(CAST(16 * (1 + {_NIB.format(pos=2)}) AS BIGINT)) AS hsum,
               sum(CASE WHEN {_NIB.format(pos=4)} % 2 = 0 THEN 1 ELSE 0 END) AS n_png
        FROM documents
        GROUP BY source
    )
    SELECT source,
           n_media,
           CAST((2 * wsum * 100 + n_media) // (2 * n_media) AS BIGINT) AS avg_width_e2,
           CAST((2 * hsum * 100 + n_media) // (2 * n_media) AS BIGINT) AS avg_height_e2,
           CAST(n_png AS BIGINT) AS n_png
    FROM agg
    ORDER BY source
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each document's UTF-8 bytes as a media struct, decode metadata
    in Arrow batches (mapInPandas; deterministic fake decoder), and roll up
    per source. The plan is scan → map-side UDF → one low-cardinality
    shuffle; payload bytes never leave the executors.

    The output is float-free: widths/heights are exact ints, so the
    averages are emitted as half-up-rounded scaled integers
    (``avg_width_e2`` = avg width × 10²) computed wholly in integer
    arithmetic — ``(2·num·100 + den) div (2·den)`` — identically on both
    engines, removing the cross-engine round(double) hash hazard."""
    docs = load(spark, "documents", sf_dir)
    media = docs.select(
        "doc_id",
        "source",
        mm.media_struct(F.encode(F.col("text"), "UTF-8"), "text/plain").alias(
            "media"
        ),
    )
    decoded = mm.decode_media(media, "media")
    return (
        decoded.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.col("width").cast("long")).alias("_wsum"),
            F.sum(F.col("height").cast("long")).alias("_hsum"),
            F.sum(F.when(F.col("format") == "png", 1).otherwise(0)).alias("n_png"),
        )
        .select(
            "source",
            "n_media",
            F.expr("(2 * _wsum * 100 + n_media) div (2 * n_media)").alias("avg_width_e2"),
            F.expr("(2 * _hsum * 100 + n_media) div (2 * n_media)").alias("avg_height_e2"),
            F.col("n_png").cast("long").alias("n_png"),
        )
        .orderBy("source")
    )


@register(
    "multimodal_pixel_roundtrip",
    oracle="""
    WITH dims AS (
        SELECT doc_id, source,
               6 + doc_id % 5 AS w,
               4 + doc_id % 3 AS h
        FROM documents
    ),
    rs AS (
        SELECT doc_id, source, w, h,
               CASE WHEN w * 4 >= h * 4 THEN 4
                    ELSE greatest(1, (w * 4) // h) END AS rw,
               CASE WHEN w * 4 >= h * 4 THEN greatest(1, (h * 4) // w)
                    ELSE 4 END AS rh
        FROM dims
    ),
    px AS (
        SELECT rs.doc_id, rs.source, rs.w, rs.h, rs.rw, rs.rh,
               sum((rs.doc_id * 131 + ((xs.x * rs.w) // rs.rw) * 7
                    + ((ys.y * rs.h) // rs.rh) * 13 + cs.c * 59) % 256)
                   AS psum
        FROM rs
        CROSS JOIN (SELECT unnest(range(0, 4)) AS x) xs
        CROSS JOIN (SELECT unnest(range(0, 4)) AS y) ys
        CROSS JOIN (SELECT unnest(range(0, 3)) AS c) cs
        WHERE xs.x < rs.rw AND ys.y < rs.rh
        GROUP BY rs.doc_id, rs.source, rs.w, rs.h, rs.rw, rs.rh
    )
    SELECT source,
           count(*) AS n_images,
           CAST(sum(w) AS BIGINT) AS sum_w,
           CAST(sum(h) AS BIGINT) AS sum_h,
           CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ppm,
           CAST(sum(rw) AS BIGINT) AS sum_rw,
           CAST(sum(rh) AS BIGINT) AS sum_rh,
           CAST(sum(psum) AS BIGINT) AS pix_sum
    FROM px
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_pixel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-pixel codec path, hash-gated end-to-end (no fake decode
    anywhere): synthesize a deterministic raster per document — pixel
    (x, y, c) = (doc_id·131 + 7x + 13y + 59c) mod 256, width 6+doc_id%5,
    height 4+doc_id%3 — ENCODE it with the fixture codec (PPM for even
    doc_ids, BMP for odd: both containers, including BMP's bottom-up row
    order and stride padding, sit on the verified path), decode the
    header/pixels back through ``decode_media(require_real=True)``,
    nearest-neighbor-resize into a 4×4 box through
    ``resize_media(require_real=True)`` (re-encoding in the same
    container), then decode the RESIZED payload and checksum its RGB
    bytes. The oracle replays the closed-form arithmetic — dims, binding
    edge, floor-mapped source pixels, byte values — in SQL, so a single
    wrong byte anywhere in encode→decode→resize→re-encode→decode flips
    the hash. All integer outputs; plan is scan → four chained
    Arrow-batched stages → one low-cardinality shuffle; payload bytes
    never leave the executors."""
    docs = load(spark, "documents", sf_dir).select("doc_id", "source")
    gen_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("media", mm.MEDIA_SCHEMA),
        ]
    )

    def synth(batches):
        for pdf in batches:
            media = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 6 + d % 5, 4 + d % 3
                rgb = bytes(
                    (d * 131 + x * 7 + y * 13 + c * 59) % 256
                    for y in range(h)
                    for x in range(w)
                    for c in range(3)
                )
                fmt = "ppm" if d % 2 == 0 else "bmp"
                media.append(
                    {
                        "data": _codecs.encode(w, h, rgb, fmt),
                        "mime": "image/ppm" if fmt == "ppm" else "image/bmp",
                        "source_meta": {},
                    }
                )
            pdf = pdf[["doc_id", "source"]].copy()
            pdf["media"] = media
            yield pdf

    decoded = mm.decode_media(
        docs.mapInPandas(synth, schema=gen_schema), "media", require_real=True
    )
    resized = mm.resize_media(
        decoded, "media", max_width=4, max_height=4, require_real=True
    )
    stats_schema = T.StructType(
        list(resized.schema.fields)
        + [
            T.StructField("rw", T.IntegerType()),
            T.StructField("rh", T.IntegerType()),
            T.StructField("psum", T.LongType()),
        ]
    )

    def resized_stats(batches):
        for pdf in batches:
            rws, rhs, psums = [], [], []
            for m in pdf["media"]:
                w, h, rgb, _ = _codecs.decode(m["mime"], bytes(m["data"]))
                rws.append(w)
                rhs.append(h)
                psums.append(sum(rgb))
            pdf = pdf.copy()
            pdf["rw"] = rws
            pdf["rh"] = rhs
            pdf["psum"] = psums
            yield pdf

    return (
        resized.mapInPandas(resized_stats, schema=stats_schema)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.col("width").cast("long")).alias("sum_w"),
            F.sum(F.col("height").cast("long")).alias("sum_h"),
            F.sum(
                F.when(F.col("format") == "ppm", 1).otherwise(0)
            ).alias("n_ppm"),
            F.sum(F.col("rw").cast("long")).alias("sum_rw"),
            F.sum(F.col("rh").cast("long")).alias("sum_rh"),
            F.sum("psum").alias("pix_sum"),
        )
        .orderBy("source")
    )


@register(
    "multimodal_resize_stats",
    oracle=f"""
    WITH dims AS (
        SELECT source,
               CAST(16 * (1 + {_NIB.format(pos=1)}) AS BIGINT) AS w,
               CAST(16 * (1 + {_NIB.format(pos=2)}) AS BIGINT) AS h
        FROM documents
    ),
    resized AS (
        SELECT source, w, h,
               (w > 96 OR h > 64) AS is_rs,
               CASE WHEN w * 64 >= h * 96
                    THEN 96
                    ELSE greatest(1, (w * 64) // h) END AS rw,
               CASE WHEN w * 64 >= h * 96
                    THEN greatest(1, (h * 96) // w)
                    ELSE 64 END AS rh
        FROM dims
    )
    SELECT source,
           count(*) AS n_media,
           CAST(sum(CASE WHEN is_rs THEN 1 ELSE 0 END) AS BIGINT) AS n_resized,
           CAST(sum(CASE WHEN is_rs THEN rw ELSE 0 END) AS BIGINT) AS sum_new_w,
           CAST(sum(CASE WHEN is_rs THEN rh ELSE 0 END) AS BIGINT) AS sum_new_h
    FROM resized
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize audit: wrap each document as media, run
    the Arrow-batched resize kernel (96×64 box), and roll up per source
    how many payloads were downscaled and their total output dimensions.
    The resize records its output dims in source_meta as exact integers
    (binding edge by cross-multiplication, floor division), so the oracle
    replays the whole transform — struct plumbing, batch shape, and
    aspect math — in SQL. Integer-only output."""
    docs = load(spark, "documents", sf_dir)
    media = docs.select(
        "source",
        mm.media_struct(F.encode(F.col("text"), "UTF-8"), "text/plain").alias(
            "media"
        ),
    )
    resized = mm.resize_media(media, "media", max_width=96, max_height=64)
    meta = F.col("media.source_meta")
    is_rs = meta["resized"] == "true"
    return (
        resized.select(
            "source",
            is_rs.alias("is_rs"),
            F.when(is_rs, meta["width"].cast("long")).otherwise(0).alias("nw"),
            F.when(is_rs, meta["height"].cast("long")).otherwise(0).alias("nh"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.when(F.col("is_rs"), 1).otherwise(0)).alias("n_resized"),
            F.sum("nw").alias("sum_new_w"),
            F.sum("nh").alias("sum_new_h"),
        )
        .orderBy("source")
    )


@register(
    "multimodal_frame_stats",
    oracle=f"""
    WITH meta AS (
        SELECT doc_id, source,
               CAST(1 + {_NIB.format(pos=3)} AS BIGINT) AS n_frames
        FROM documents
    )
    SELECT source,
           CAST(sum((n_frames + 1) // 2) AS BIGINT) AS n_sampled,
           CAST(sum(((n_frames + 1) // 2) * ((n_frames + 1) // 2 - 1))
               AS BIGINT) AS sum_frame_idx
    FROM meta
    GROUP BY source
    ORDER BY source
    """,
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling audit: explode every media payload into its frames
    through the 1→N mapInPandas generator with stride 2, then count the
    sampled frames and sum their indices per source. With stride 2 a clip
    of n frames yields ceil(n/2) samples at indices 0,2,4,… whose sum is
    k·(k-1) for k = ceil(n/2) — exact integers the oracle recomputes from
    the fake-decode frame counts, pinning the generator's fan-out shape
    and stride arithmetic."""
    docs = load(spark, "documents", sf_dir)
    media = docs.select(
        "doc_id",
        "source",
        mm.media_struct(F.encode(F.col("text"), "UTF-8"), "text/plain").alias(
            "media"
        ),
    )
    frames = mm.sample_frames(media, "doc_id", "media", every=2)
    return (
        frames.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("frame_idx").cast("long")).alias("sum_frame_idx"),
        )
        .orderBy("source")
    )
