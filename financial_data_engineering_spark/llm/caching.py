"""Tracked persistence for operator-internal intermediates.

Several dedup/similarity operators persist an intermediate (inverted
shingle index, banded signature table, vector projection) because it feeds
two or more downstream consumers in the SAME returned plan — without the
cache Spark would re-run the full lineage once per consumer. The returned
DataFrame is lazy, so the operator itself cannot unpersist (that would drop
the blocks before the caller ever materializes the result).

Instead operators persist through :func:`persist_tracked`, and callers
release everything with :func:`release_intermediates` once the results have
been materialized (collected, written, or counted). Harnesses that call
``spark.catalog.clearCache()`` between queries get the same effect;
``release_intermediates`` is for library sessions running many operators
back-to-back that would otherwise accumulate executor storage.

Usage::

    pairs = minhash_near_dup_pairs(docs).collect()
    release_intermediates()   # drop operator-internal cached blocks
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

#: Intermediates persisted by operators since the last release. Bounded by
#: the number of operator calls between releases; holding the references
#: here is what lets a later release unpersist frames whose plans have
#: already been consumed.
_TRACKED: list[DataFrame] = []


def persist_tracked(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` at ``level`` and register it for later release."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def release_intermediates(blocking: bool = False) -> int:
    """Unpersist every tracked intermediate; returns how many were released.

    Safe to call at any point after the operator results have been
    materialized; unpersisting an already-cleared frame is a no-op.
    """
    released = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:  # noqa: BLE001 — session may already be stopped
            pass
    return released
