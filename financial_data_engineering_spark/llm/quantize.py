"""Scalar (int8) embedding quantization — the storage-compression op a
100 TB embedding corpus needs (4 bytes/dim float32 → 1 byte/dim + two
scale floats, a 4× footprint cut before any ANN index is built).

Per-vector min/max scaling: ``code_j = floor((x_j - mn) * 255 / (mx - mn)
+ 0.5)`` clamped to [0, 255] (constant vectors quantize to all-zero
codes). Everything is expressed relationally — posexplode + one
per-vector window for mn/mx (the groupBy that follows reuses the same
partitioning, so the whole operator is ONE shuffle) — and every rounding
step is ``floor(v + 0.5)``: floor of a double is true-value-based and
identical in every engine, unlike round(double, d), which can differ at
shortest-repr half boundaries. That makes the codes and the
reconstruction-error audit exactly replayable in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ERR_SCALE = 1_000_000


def quantization_stats(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector quantization audit: sum of int8 codes (a checksum of
    the quantized representation) and mean absolute reconstruction error
    as a half-up scaled integer (``mean_err_e6`` = mean |x - x̂| × 10⁶ —
    float-free output like every ratio in this engine).

    Plan: posexplode (map-side) → window mn/mx per vector → codegen
    arithmetic → groupBy vector. Window and groupBy share the hash
    partitioning on ``id_col``, so the operator costs one exchange plus
    the presentation sort."""
    ex = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("j", "x"),
    ).select("vec_id", "j", F.col("x").cast("double").alias("x"))
    w = Window.partitionBy("vec_id")
    b = ex.select(
        "vec_id",
        "x",
        F.min("x").over(w).alias("mn"),
        F.max("x").over(w).alias("mx"),
    )
    c = b.select(
        "vec_id",
        "x",
        "mn",
        "mx",
        F.when(
            F.col("mx") > F.col("mn"),
            F.floor(
                ((F.col("x") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn")))
                + 0.5
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("code"),
    )
    e = c.select(
        "vec_id",
        "code",
        F.floor(
            F.abs(
                F.col("x")
                - (F.col("mn") + (F.col("code") * (F.col("mx") - F.col("mn"))) / 255)
            )
            * ERR_SCALE
            + 0.5
        )
        .cast("long")
        .alias("err_e6"),
    )
    return (
        e.groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("code").alias("code_sum"),
            F.sum("err_e6").alias("_err_sum"),
        )
        .select(
            "vec_id",
            "code_sum",
            F.expr("(2 * _err_sum + _n) div (2 * _n)").alias("mean_err_e6"),
        )
    )


def code_arrays(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes, mn_e4, d_e4, csum) — each vector's int8 code
    sequence as an ordered long array PLUS the integer-fixed affine
    frame that dequantizes it: ``mn_e4`` = floor(mn·10⁴ + 0.5), ``d_e4``
    = floor((mx−mn)·10⁴ + 0.5), and the code checksum. Component j
    dequantizes (up to the e4 fix) to ``(mn_e4·255 + code_j·d_e4)`` in
    1/(255·10⁴) units — all integers, so a dequantized DOT between two
    vectors expands into exact int64 arithmetic over (code_dot, csum,
    mn_e4, d_e4) and never re-touches the float column (see
    llm/similarity.py quantized_rerank_topk). Identical code arithmetic
    to :func:`quantization_stats` (same floor(v+0.5) steps, so the
    oracle replays everything bit-for-bit); the array assembles via
    array_sort over (position, code) structs in the same one-exchange
    window+groupBy plan."""
    ex = emb.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("j", "x"),
    ).select("vec_id", "j", F.col("x").cast("double").alias("x"))
    w = Window.partitionBy("vec_id")
    b = ex.select(
        "vec_id",
        "j",
        "x",
        F.min("x").over(w).alias("mn"),
        F.max("x").over(w).alias("mx"),
    )
    c = b.select(
        "vec_id",
        "j",
        "mn",
        "mx",
        F.when(
            F.col("mx") > F.col("mn"),
            F.floor(
                ((F.col("x") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn")))
                + 0.5
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("code"),
    )
    return c.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "code"))),
            lambda s: s["code"],
        ).alias("codes"),
        F.floor(F.first("mn") * 10_000 + F.lit(0.5)).cast("long").alias("mn_e4"),
        F.floor((F.first("mx") - F.first("mn")) * 10_000 + F.lit(0.5))
        .cast("long")
        .alias("d_e4"),
        F.sum("code").alias("csum"),
    )
