"""As-of (backward) join — an operator the reference lacks and Spark has no
native form of; required for point-in-time financial joins (trade↔quote,
event↔latest-order).

Implemented as the union+window plan rather than a per-group pandas
``merge_asof``: tag both sides, union them, and for each left row take the
last right payload at-or-before its timestamp with
``last(..., ignorenulls=True)`` over a key-partitioned window.

Scale properties: exactly ONE shuffle (on the join key), no broadcast of
either side, no Python on the hot path, skew handled by AQE. A per-group
``applyInPandas`` merge_asof would serialize every group through Arrow and
break on groups larger than executor memory; this plan streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: Sequence[str],
    right_on: str | None = None,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row (same key,
    ``right_time <= left_time``). Payload columns are NULL when no prior
    right row exists (or the latest one is older than ``tolerance_seconds``).
    """
    right_key = right_on or on
    payload = list(payload_cols)
    if right_time not in payload:
        payload = [right_time] + payload

    right_side = right.select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
        F.lit(0).alias("__side"),
    )
    payload_type = right_side.schema["__payload"].dataType

    left_side = left.select(
        "*",
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(None).cast(payload_type).alias("__payload"),
        F.lit(1).alias("__side"),
    )

    # Right rows sort before left rows at equal timestamps so "<=" holds.
    w = (
        Window.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from financial_data_engineering_spark.partitioning import spread_by

    # spread_by pins the key exchange at the session's full shuffle
    # width: the window pass is CPU-heavy (struct carry per row) at a
    # few shuffle bytes per row, so AQE's bytes-based coalescing ran it
    # on 6-9 of 32 cores at sf0.1; the explicit hash repartition is the
    # exchange the window needs anyway — net added shuffles zero.
    merged = (
        spread_by(
            left_side.unionByName(
                right_side.select(
                    *[
                        F.lit(None).cast(f.dataType).alias(f.name)
                        for f in left.schema
                    ],
                    "__key",
                    "__t",
                    "__payload",
                    "__side",
                )
            ),
            "__key",
        )
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    if tolerance_seconds is not None:
        in_range = F.col("__match").isNotNull() & (
            F.unix_timestamp(F.col("__t"))
            - F.unix_timestamp(F.col("__match").getField(right_time))
            <= F.lit(tolerance_seconds)
        )
        merged = merged.withColumn(
            "__match", F.when(in_range, F.col("__match"))
        )

    out_cols = [F.col(f.name) for f in left.schema]
    out_cols += [F.col("__match").getField(c).alias(c) for c in payload]
    return merged.select(*out_cols)
