"""Event-stream queries (SURVEY.md §2.L / §7.4): tumbling, sliding, and
session windows plus a point-in-time as-of join.

These run the same expressions batch-mode here (oracle-checkable) and
streaming-mode in financial_data_engineering_spark.streaming — Structured
Streaming's unified model means the plan is identical; the streaming module
adds watermarks and output modes on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_engineering_spark.operators import argmax_per_group, asof_join
from financial_data_engineering_spark.operators.sequences import (
    pattern_run_counts,
)
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

#: a view, then any views/clicks, ending in a purchase (event-type
#: initials are distinct in this corpus).
BROWSE_TO_BUY_PATTERN = "v[vc]*p"


@register(
    "hourly_event_rollup",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_value_e2
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window aggregation: ``window(ts, '1 hour')``. Epoch-aligned,
    so window.start == date_trunc('hour'). One shuffle on (window, type);
    partial aggregation runs map-side before it."""
    events = load(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_value_e2"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value_e2",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "sliding_event_counts",
    oracle="""
    SELECT date_trunc('hour', ts) - to_hours(off) AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_value_e2,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS max_value_e2
    FROM events, (SELECT unnest([0, 1]) AS off)
    GROUP BY 1
    ORDER BY window_start
    """,
)
def sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: ``window(ts, '2 hours', '1 hour')`` — every event
    lands in exactly two hour-aligned windows. The oracle reproduces the
    assignment by fanning each row out to both its windows."""
    events = load(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_value_e2"
            ),
            F.max(F.round(F.col("value") * 100).cast("long")).alias(
                "max_value_e2"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value_e2",
            "max_value_e2",
        )
        .orderBy("window_start")
    )


@register(
    "user_sessions",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_no
        FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: ``session_window(ts, '30 minutes')`` per user —
    a session extends while consecutive gaps stay under 30 minutes and ends
    at last_event + gap. The oracle derives identical sessions with the
    gaps-and-islands pattern (lag + running sum), pinning Spark's
    half-open [start, end) merge semantics."""
    events = load(spark, "events", sf_dir)
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "event_funnel_pairs",
    oracle="""
    SELECT c.user_id AS user_id,
           c.event_id AS first_id,
           p.event_id AS then_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT)
               AS micros_to_conversion
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    ORDER BY first_id, then_id
    """,
)
def event_funnel_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel/attribution interval join: every click paired with each
    purchase by the same user within the following hour. Batch face of
    streaming.funnel_pairs — the SAME function body; the watermarks it
    declares are no-ops on a batch frame, so the oracle pins the exact
    semantics the streaming stream-stream join produces (parity asserted
    in tests/test_streaming.py). Conversion latency is emitted as exact
    integer microseconds — no float reaches the compared output."""
    from financial_data_engineering_spark.streaming import funnel_pairs

    events = load(spark, "events", sf_dir)
    return funnel_pairs(events).orderBy("first_id", "then_id")


@register(
    "events_asof_latest_order",
    oracle="""
    WITH latest_per_day AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
        FROM (
            SELECT o.*, row_number() OVER (
                       PARTITION BY o_custkey, o_orderdate
                       ORDER BY o_orderkey DESC) AS rn
            FROM orders o
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS last_orderkey,
           o.o_orderdate AS last_orderdate,
           o.o_totalprice AS last_totalprice
    FROM events e
    ASOF LEFT JOIN latest_per_day o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    ORDER BY e.event_id
    """,
)
def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time as-of join: each event picks up the customer's most
    recent order at-or-before the event timestamp — the trade↔quote shape.

    The right side is first reduced to one row per (customer, orderdate)
    (window argmax) because as-of semantics are undefined under timestamp
    ties; then the single-shuffle union+window as-of plan applies. Verified
    against DuckDB's native ASOF JOIN."""
    events = load(spark, "events", sf_dir)
    orders = load(spark, "orders", sf_dir)
    latest_per_day = argmax_per_group(
        orders.select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"),
        ["o_custkey", "o_orderdate"],
        "o_orderkey",
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        latest_per_day,
        on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_orderdate").alias("last_orderdate"),
        F.col("o_totalprice").alias("last_totalprice"),
    ).orderBy("event_id")


@register(
    "event_rollup_grouping_sets",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(ts AS DATE) AS day, value FROM events
    )
    SELECT CAST(2 * GROUPING(event_type) + GROUPING(day) AS BIGINT) AS gid,
           event_type,
           day,
           count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS total_value_e2
    FROM e
    GROUP BY ROLLUP (event_type, day)
    ORDER BY gid, event_type NULLS FIRST, day NULLS FIRST
    """,
)
def event_rollup_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup in ONE pass — the hypertable/OLAP-cube
    pattern: (event_type, day) leaves, per-type subtotals, and the grand
    total from a single ROLLUP aggregation instead of three queries over
    the fact. ``gid`` (2·grouping(type) + grouping(day)) disambiguates a
    subtotal row from a data row whose key is genuinely NULL.

    Spark expands grouping sets BEFORE the exchange, so partial
    aggregation still runs map-side for every granularity and the single
    shuffle carries (leaves + subtotals + 1) keys — at 100 TB that is one
    fact-table pass instead of one per granularity, the whole point of the
    operator."""
    events = load(spark, "events", sf_dir)
    return (
        events.select("event_type", F.to_date(F.col("ts")).alias("day"), "value")
        .rollup("event_type", "day")
        .agg(
            (F.grouping("event_type") * 2 + F.grouping("day"))
            .cast("bigint")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "total_value_e2"
            ),
        )
        .select("gid", "event_type", "day", "n_events", "total_value_e2")
        .orderBy(
            "gid",
            F.asc_nulls_first("event_type"),
            F.asc_nulls_first("day"),
        )
    )


@register(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 5.0) AS BIGINT) AS bucket,
           count(*) AS n
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per type: floor(value/width)
    bucket ids — one partial-aggregated shuffle, the distribution-profile
    primitive every monitoring layer needs. The bucket id is the same
    IEEE divide+floor on both engines, so counts replay exactly."""
    events = load(spark, "events", sf_dir)
    return (
        events.groupBy(
            "event_type",
            F.floor(F.col("value") / 5.0).cast("bigint").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bucket")
    )


@register(
    "user_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
        FROM events GROUP BY user_id
    ),
    hits AS (
        SELECT DISTINCT f.cohort_day,
               date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
               e.user_id
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) BETWEEN 0 AND 7
    )
    SELECT cohort_day, day_offset, count(*) AS n_users
    FROM hits GROUP BY cohort_day, day_offset
    ORDER BY cohort_day, day_offset
    """,
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their FIRST event day, counted
    on each of the next 7 days they return — the product-analytics
    staple. Three shuffles: the per-user first-day aggregate, the
    per-user join back (both keyed on user_id — at 100 TB the firsts
    side is |users| rows and usually broadcastable), and the final
    (cohort, offset) rollup after a distinct that dedups multiple
    same-day events. Day arithmetic is integer date differences."""
    events = load(spark, "events", sf_dir)
    firsts = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    hits = (
        events.join(F.broadcast(firsts), "user_id")
        .select(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias(
                "day_offset"
            ),
            "user_id",
        )
        .filter(F.col("day_offset").between(0, 7))
        .distinct()
    )
    return (
        hits.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "sliding_active_users",
    oracle="""
    SELECT date_trunc('hour', ts) - to_hours(off) AS window_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_active_users
    FROM events, (SELECT unnest([0, 1]) AS off)
    GROUP BY 1
    ORDER BY window_start
    """,
)
def sliding_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per 2-hour sliding window (1-hour slide) — the
    active-user engagement metric, with EXACT distinct inside overlapping
    windows (each event fans out to its two windows before the
    dedup-aggregate; Spark plans the distinct as the standard two-phase
    expand). For dashboards at 100 TB swap the exact distinct for the
    mergeable KMV sketch (operators/sketch.py) — this query is the audit
    twin that pins the sketch's ground truth."""
    events = load(spark, "events", sf_dir)
    return (
        events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_active_users"))
        .select(F.col("w.start").alias("window_start"), "n_active_users")
        .orderBy("window_start")
    )


@register(
    "user_browse_to_buy_runs",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'v[vc]*p')) AS BIGINT)
               AS n_runs
    FROM seqs
    ORDER BY user_id
    """,
)
def user_browse_to_buy_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching (MATCH_RECOGNIZE-flavored CEP): per user,
    count browse-to-buy runs — a view, then any views/clicks, ending in a
    purchase — as non-overlapping regex matches over the user's ordered
    event-initial string. Plan, ordering tiebreak, and pattern semantics
    live in operators/sequences.py (shared with the telemetry example)."""
    events = load(spark, "events", sf_dir)
    return pattern_run_counts(events, BROWSE_TO_BUY_PATTERN).orderBy(
        "user_id"
    )


@register(
    "event_value_dispersion",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    )
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(v) AS BIGINT) AS sum_e2,
           CAST((2 * (count(*) * sum(CAST(v AS HUGEINT) * v)
                      - sum(CAST(v AS HUGEINT)) * sum(v))
                 + count(*) * count(*))
                // (2 * count(*) * count(*)) AS BIGINT) AS var_e4
    FROM v
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def event_value_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population variance per event type from the MERGEABLE moment
    triple (n, Σx, Σx²) — the distributed-variance primitive: partial
    moments combine map-side, so one shuffle of three numbers per group
    replaces any two-pass mean-then-deviation plan.

    All integer: x is the e2-scaled value, Σx² accumulates in
    DECIMAL(38,0) (HUGEINT on the oracle side) so the n·Σx² − (Σx)²
    numerator cannot overflow, and var_e4 = numerator / n² lands by the
    repo-standard round-half-up div idiom — Spark's decimal ``div`` and
    DuckDB's HUGEINT ``//`` truncate identically on the non-negative
    variance numerator."""
    events = load(spark, "events", sf_dir)
    base = events.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("sum_e2"),
        F.sum(
            F.expr("CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0))")
        ).alias("_ss"),
    )
    return (
        agg.select(
            "event_type",
            "n_events",
            "sum_e2",
            F.expr(
                "CAST((2 * (CAST(n_events AS DECIMAL(38,0)) * _ss"
                " - CAST(sum_e2 AS DECIMAL(19,0))"
                "   * CAST(sum_e2 AS DECIMAL(19,0)))"
                " + CAST(n_events AS DECIMAL(38,0)) * n_events)"
                " div (2 * CAST(n_events AS DECIMAL(38,0)) * n_events)"
                " AS BIGINT)"
            ).alias("var_e4"),
        )
        .orderBy("event_type")
    )
