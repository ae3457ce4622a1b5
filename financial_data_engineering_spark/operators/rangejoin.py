"""Bucketed point-in-interval (range) join.

Spark has no native range-join optimization: an inequality-only join
condition (``point >= start AND point < end``) compiles to a broadcast
nested-loop join at best and a cartesian product at worst — both
scale-killers on big×big inputs. The standard fix (public pattern, known
from range-join bucketing in warehouse engines) is to discretize: every
interval is exploded onto the fixed-width buckets it covers, every point
is mapped to its containing bucket, the join becomes an EQUI-join on
bucket id (+ any extra equality keys), and the exact containment predicate
runs as a post-join filter on the tiny per-bucket candidate set.

Cost model: with bucket width ~ median interval width, each interval lands
in <= 2 buckets, so the exploded side grows ~2x and the shuffle keys are
uniform bucket ids. Per-bucket work is |points_in_bucket| x
|intervals_touching_bucket| — pick the bucket width to balance key count
(parallelism) against per-bucket product (task size). Whole plan stays in
codegen: explode + shuffle + filter, no NLJ anywhere.

Units: point/start/end are LONG columns in caller-chosen units (epoch
days, epoch seconds, integer ids…), non-negative; ``end`` is exclusive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: name of the internal bucket column (dropped before returning).
_BUCKET = "__range_bucket"


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join every point row to every interval row containing it
    (``start <= point < end``), optionally also matching on equality
    ``keys`` present in both frames. Columns from both inputs survive;
    point/start/end are non-negative longs in the same units."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    join_keys = [_BUCKET, *(keys or [])]
    p = points.withColumn(_BUCKET, F.expr(f"{point_col} div {bucket_width}"))
    # ``end`` is exclusive, so the last bucket an interval can match in is
    # (end - 1) div width — using end div width would emit one dead candidate
    # bucket per exactly-aligned interval (correct but wasted join work).
    # greatest() guards a degenerate empty interval (start == end) from
    # producing a descending sequence.
    iv = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_width}"),
                F.expr(
                    f"greatest({start_col} div {bucket_width},"
                    f" ({end_col} - 1) div {bucket_width})"
                ),
            )
        ),
    )
    return (
        p.join(iv, join_keys)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop(_BUCKET)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    *,
    bucket_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner-join interval rows whose half-open ranges overlap
    (``l_start < r_end AND r_start < l_end``), optionally also matching
    equality ``keys``. Both sides explode onto their covered buckets and
    equi-join on bucket id; a pair overlapping across several buckets is
    kept exactly once WITHOUT a distinct shuffle, by accepting the match
    only in the first bucket both intervals share —
    ``bucket == greatest(l_start, r_start) div width`` — a pure filter,
    so dedup costs nothing. Column names must be disjoint between the
    two inputs (alias before calling for self-joins)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be a positive integer")
    join_keys = [_BUCKET, *(keys or [])]
    # Half-open ends: last reachable bucket is (end - 1) div width; see
    # point_in_interval_join for the greatest() empty-interval guard.
    lv = left.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.expr(f"{l_start} div {bucket_width}"),
                F.expr(
                    f"greatest({l_start} div {bucket_width},"
                    f" ({l_end} - 1) div {bucket_width})"
                ),
            )
        ),
    )
    rv = right.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.expr(f"{r_start} div {bucket_width}"),
                F.expr(
                    f"greatest({r_start} div {bucket_width},"
                    f" ({r_end} - 1) div {bucket_width})"
                ),
            )
        ),
    )
    return (
        lv.join(rv, join_keys)
        .filter(
            (F.col(l_start) < F.col(r_end))
            & (F.col(r_start) < F.col(l_end))
            & (
                F.col(_BUCKET)
                == F.expr(f"greatest({l_start}, {r_start}) div {bucket_width}")
            )
        )
        .drop(_BUCKET)
    )
