"""Per-entity event-sequence operators: transition pairs and
symbol-pattern run counting.

Shared by the oracle-checked queries (queries/analytics_ext.py
``event_transition_counts``, queries/events.py
``user_browse_to_buy_runs``), their streaming twin
(streaming/stateful.py ``event_transitions``), and the telemetry example
— one definition of the ordering tiebreak and the pattern semantics, so
the batch plan, the oracle, and every reuse stay in lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def transition_counts(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition counts: (prev_type, next_type,
    n_transitions), unordered. One shuffle to the per-entity window
    (``id_col`` tiebreaks equal timestamps), one to the pair aggregate
    whose cardinality is |types|² — tiny at any scale."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    return (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def pattern_run_counts(
    events: DataFrame,
    pattern: str,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    max_seq_len: int | None = 1_000_000,
) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-flavored CEP): per
    entity, the count of non-overlapping ``pattern`` regex matches over
    the ordered string of event-type INITIALS (types must have distinct
    first characters; pre-map to symbols when they don't).

    Output: (entity_col, n_events, n_runs). One shuffle assembles each
    entity's sequence (``array_sort`` over collected (ts, id, type)
    structs — a deterministic total order); the regex is map-side.
    ``collect_list`` bounds memory by the per-entity sequence length —
    the assumption every CEP engine makes. ``max_seq_len`` enforces that
    assumption: a degenerate hot entity (a bot account, a null-key
    bucket) past the bound raises here, at a cheap count aggregate,
    instead of OOMing an executor mid-collect (the ``max_block_names`` /
    ``max_bucket_size`` refusal convention).

    NOTE: the guard is an EAGER extra action — it runs a full count
    aggregate at call time, before any plan is returned. Pass
    ``max_seq_len=None`` to skip it and stay lazily composable (when
    the caller already bounds per-entity cardinality upstream, or the
    input is a streaming DataFrame, which cannot run the guard's batch
    collect). For genuinely unbounded sequences use
    streaming.event_transitions and match incrementally.
    """
    if max_seq_len is not None:
        if max_seq_len < 1:
            raise ValueError(f"max_seq_len must be >= 1, got {max_seq_len}")
        oversized = (
            events.groupBy(entity_col)
            .agg(F.count(F.lit(1)).alias("n_events"))
            .filter(F.col("n_events") > max_seq_len)
            .limit(1)
            .collect()
        )
        if oversized:
            row = oversized[0]
            raise ValueError(
                f"entity {row[entity_col]!r} has {row['n_events']} events "
                f"(max_seq_len={max_seq_len}); refusing the unbounded "
                "collect_list — raise the bound or match incrementally via "
                "streaming.event_transitions"
            )
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(ts_col, id_col, type_col))
            ),
            lambda s: F.substring(s[type_col], 1, 1),
        ),
    )
    return (
        events.groupBy(entity_col)
        .agg(seq.alias("seq"))
        .select(
            entity_col,
            F.length("seq").cast("long").alias("n_events"),
            F.size(
                F.regexp_extract_all("seq", F.lit(pattern), F.lit(0))
            )
            .cast("long")
            .alias("n_runs"),
        )
    )
