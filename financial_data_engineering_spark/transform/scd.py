"""Type-2 slowly-changing-dimension derivation from an observation log.

The reference's dimensional layer (src/transformers/base_transformer.py,
star_schema build) stops at type-1 dimensions — every load overwrites the
row. A financial warehouse usually needs type 2: when a tracked attribute
changes, CLOSE the old version (stamp its ``valid_to``) and open a new one,
so every fact can join the dimension AS OF its own timestamp. This module
derives that history in one pass from a log of (key, attrs, observed-at)
observations — the shape every source in this engine already produces.

Spark-first design: the whole derivation is the gaps-and-islands pattern —
change detection with ``lag``, version numbering with a running sum,
interval bounds with ``min``/``lead`` — expressed as window functions over
ONE hash partitioning on the dimension key. Every window and the version
roll-up cluster on supersets of that key, so Catalyst inserts sorts but no
further Exchange: the entire history build costs a single data shuffle at
any scale, and versions of one entity never cross executors. All
expressions are codegen-able; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_observations(
    observations: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Collapse an observation log into type-2 dimension rows.

    Consecutive observations of one key (ordered by ``ts_col`` then
    ``tie_col`` — the tie-breaker makes the order total, so the result is
    deterministic under same-timestamp observations) with identical
    ``attr_cols`` merge into one version. A version's ``valid_from`` is its
    first observation; ``valid_to`` is the next version's ``valid_from``
    (half-open intervals, so an as-of probe ``valid_from <= t < valid_to``
    matches exactly one version) and NULL on the current version, which
    also carries ``is_current = 1``.

    Returns one row per (key, version): key columns, ``version`` (1-based
    BIGINT), the attribute columns, ``valid_from``, ``valid_to``,
    ``is_current`` (BIGINT 0/1), ``n_observations``.
    """
    order = [F.col(ts_col).asc(), F.col(tie_col).asc()]
    by_key = Window.partitionBy(*key_cols).orderBy(*order)

    def _changed() -> Column:
        # NULL-safe "any attribute differs from the previous observation".
        # The first observation must open version 1 EXPLICITLY (row_number
        # term): relying on lag() being NULL fails when the attribute
        # itself is NULL, since NULL <=> NULL is true.
        change = F.row_number().over(by_key) == 1
        for a in attr_cols:
            change = change | ~F.col(a).eqNullSafe(F.lag(a).over(by_key))
        return change.cast("int")

    versioned = observations.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("observed_at"),
        F.col(tie_col).alias("_tie"),
        F.sum(_changed())
        .over(by_key.rowsBetween(Window.unboundedPreceding, 0))
        .alias("version"),
    )
    # Roll observations up into versions. Grouping keys are a superset of
    # the window partitioning, so this stays in the same shuffle.
    versions = versioned.groupBy(*key_cols, *attr_cols, "version").agg(
        F.min("observed_at").alias("valid_from"),
        F.count(F.lit(1)).alias("n_observations"),
    )
    succ = Window.partitionBy(*key_cols).orderBy(F.col("version").asc())
    return versions.select(
        *key_cols,
        F.col("version").cast("bigint").alias("version"),
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(succ).alias("valid_to"),
        F.when(F.lead("valid_from").over(succ).isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_current"),
        "n_observations",
    )
