"""Changelog application (MERGE INTO semantics) over DataFrames.

``apply_changelog`` replays an insert/update/delete event stream onto a
snapshot — the core of CDC ingestion, late-arriving-fact repair, and
incremental table maintenance. Spark has no MERGE against plain parquet
frames (that lives in table formats), but the semantics compose from
two primitives the engine already scales: an argmax-per-key window over
the CHANGE set (never the snapshot) and one full-outer join on the key.

Scale shape: the window shuffles only the changelog (in steady-state
ingestion |changes| << |snapshot|); the outer join shuffles both sides
once on the key — at 100 TB that join is the unavoidable cost of a
snapshot rewrite, and it partitions cleanly by key (bucketed snapshot
storage turns it into a co-located join). Last-writer-wins resolution
requires a TOTAL order on the change stream; callers must pass a
tiebreak column (sequence/offset), exactly like the argmax contract in
operators/relational.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: op-column values understood by apply_changelog.
OP_UPSERT = ("I", "U")
OP_DELETE = "D"


def last_change_per_key(
    changes: DataFrame, key: str, order: Sequence[str | Column]
) -> DataFrame:
    """Last-writer-wins: the final change row per key under the given
    total order (argmax window over the CHANGELOG only)."""
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() if isinstance(c, str) else c.desc() for c in order]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    order: Sequence[str | Column],
    *,
    op_col: str = "op",
    payload: Sequence[str] = (),
    status_alias: str = "status",
) -> DataFrame:
    """Merge ``changes`` (columns: key, *order, op_col, *payload) into
    ``snapshot`` (columns: key, *payload):

    - the LAST change per key wins (``order`` must be total);
    - final op ``D`` deletes the key (even if the snapshot lacks it —
      idempotent);
    - final op ``I``/``U`` upserts: payload columns are taken from the
      change, inserting the key when the snapshot lacks it;
    - untouched snapshot keys pass through.

    Adds ``status``: 'kept' / 'updated' / 'inserted' (deleted keys have
    no row to carry a status). One window over the changelog + one
    full-outer join; no snapshot-side window.
    """
    last = last_change_per_key(
        changes.select(key, *[c for c in order if isinstance(c, str)],
                       op_col, *payload),
        key,
        order,
    ).select(key, op_col, *payload)
    s = snapshot.select(key, *payload).alias("s")
    c = last.alias("c")
    joined = s.join(c, F.col(f"s.{key}") == F.col(f"c.{key}"), "full")
    merged_key = F.coalesce(F.col(f"s.{key}"), F.col(f"c.{key}"))
    status = (
        F.when(F.col(f"c.{op_col}").isNull(), F.lit("kept"))
        .when(F.col(f"s.{key}").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    return joined.filter(
        F.col(f"c.{op_col}").isNull() | (F.col(f"c.{op_col}") != OP_DELETE)
    ).select(
        merged_key.alias(key),
        status.alias(status_alias),
        *[
            F.coalesce(F.col(f"c.{p}"), F.col(f"s.{p}")).alias(p)
            for p in payload
        ],
    )


def scd2_intervals(
    changes: DataFrame,
    key: str,
    order: Sequence[str],
    *,
    payload: Sequence[str] = (),
    version_alias: str = "version",
    valid_from_alias: str = "valid_from",
    valid_to_alias: str = "valid_to",
    current_alias: str = "is_current",
) -> DataFrame:
    """Type-2 slowly-changing-dimension intervals from a changelog: one
    row per (key, change) carrying the payload AT that version,
    half-open validity ``[valid_from, valid_to)`` (``valid_to`` NULL on
    the current version), a 1-based ``version`` number, and an
    ``is_current`` flag — the dimension shape a point-in-time (as-of)
    fact join consumes (operators/asof.py), and the history the
    last-writer-wins merge (``apply_changelog``) deliberately discards.

    ``order`` must be a total order per key (the apply_changelog
    contract); its FIRST column is the change timestamp that becomes
    the validity boundary. One window partitioned by the KEY — key
    cardinality scales with the data, so parallelism does too (no
    low-card hazard); no joins, no second pass.
    """
    ts = order[0]
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order])
    return changes.select(
        key,
        *payload,
        F.row_number().over(w).alias(version_alias),
        F.col(ts).alias(valid_from_alias),
        F.lead(ts).over(w).alias(valid_to_alias),
        F.lead(ts).over(w).isNull().alias(current_alias),
    )
