"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.L — the reference has no streaming; this is the designed
extension for per-key state that windowed aggregates can't express).

``running_user_stats`` maintains per-user lifetime counters (event count,
value sum, max single value, last-seen timestamp) across micro-batches and
emits the updated row for every user touched in a batch — the
feature-store/CDC shape: downstream consumers always see the latest
per-key aggregate without recomputing history.

Scale: state is partitioned by user_id across the cluster's state store
(RocksDB provider on a real deployment); each micro-batch shuffles only
that batch's events to their key's partition. The Arrow batch boundary
means Python sees one (key, batch-slice) pandas frame per key per batch.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_value double, "
    "last_ts timestamp"
)

STATE_SCHEMA = "n long, total double, mx double, last long"


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State transition: fold this batch's slice into the persisted
    (count, sum, max, last_seen_micros) tuple and emit the new totals."""
    n, total, mx, last = state.get if state.exists else (0, 0.0, None, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = float(pdf["value"].max()) if len(pdf) else None
        if batch_max is not None:
            mx = batch_max if mx is None else max(mx, batch_max)
        batch_last = pdf["ts"].max()
        if pd.notna(batch_last):
            micros = int(batch_last.value // 1000)
            last = micros if last is None else max(last, micros)
    state.update((n, total, mx, last))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_value": [mx],
            "last_ts": [pd.Timestamp(last, unit="us") if last is not None else None],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user lifetime stats, updated each micro-batch. Use with
    ``outputMode("update")``; state never expires (lifetime counters —
    swap in ``GroupStateTimeout.EventTimeTimeout`` plus a watermark to
    bound state for keys that go quiet)."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
