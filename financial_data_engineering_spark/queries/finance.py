"""Financial bar/band queries: OHLC bars, rolling Bollinger-style band
breaches, and the EWMA fixed-point band — the market-data depth on top
of round 6's VWAP/TWAP/gap aggregates (analytics_ext.py).

The reference's argmax-per-group shape (reference
examples/multi_source_pipeline.py:114) is the kernel of all three:
open/close are argmin/argmax over an event-time total order, and the
band queries compare each tick against statistics of its own past.
Everything follows the registry's integer-exactness rule — prices enter
as e2 longs, every derived quantity is int64 arithmetic (squared-
inequality forms instead of sqrt, half-up fixed-point division instead
of float EWMA), so DuckDB replays every bit.

Event-time total order: ticks are ordered by a fixed-width string key
``lpad(epoch_us, 20) || lpad(orderkey, 12) || lpad(linenumber, 2)``
(micros and keys are nonnegative, so zero-padded decimal strings order
exactly like the integers; (orderkey, linenumber) is unique, so the
order is total and open/close are deterministic). Both engines build
the identical string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from financial_data_engineering_spark.operators.finance import (
    BAND_K,
    ewma_band_fold,
    ohlc_bars,
)
from financial_data_engineering_spark.queries.registry import register
from financial_data_engineering_spark.tables import load

#: Rolling-band window: statistics over the ROLL_N ticks strictly before
#: the current one; a tick is evaluated only once ROLL_MIN past ticks
#: exist (early-history ticks have no meaningful band).
ROLL_N = 20
ROLL_MIN = 5

_LI_SEQ_SQL = """
        SELECT p.p_brand AS brand,
               strftime(l.l_shipdate, '%Y-%m') AS bar_month,
               lpad(CAST(epoch_us(l.l_shipdate) AS VARCHAR), 20, '0')
                 || lpad(CAST(l.l_orderkey AS VARCHAR), 12, '0')
                 || lpad(CAST(l.l_linenumber AS VARCHAR), 2, '0') AS o,
               CAST(round(l.l_extendedprice * 100) AS BIGINT) AS px,
               CAST(l.l_quantity AS BIGINT) AS qty
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
"""


def _li_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(brand, bar_month, o, px, qty) tick view of lineitem — the Spark
    twin of _LI_SEQ_SQL."""
    li = load(spark, "lineitem", sf_dir)
    part = load(spark, "part", sf_dir).select("p_partkey", "p_brand")
    return li.join(part, li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        F.date_format("l_shipdate", "yyyy-MM").alias("bar_month"),
        F.concat(
            F.lpad(F.unix_micros("l_shipdate").cast("string"), 20, "0"),
            F.lpad(F.col("l_orderkey").cast("string"), 12, "0"),
            F.lpad(F.col("l_linenumber").cast("string"), 2, "0"),
        ).alias("o"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("px"),
        F.col("l_quantity").cast("long").alias("qty"),
    )


@register(
    "part_brand_ohlc_monthly",
    oracle=f"""
    WITH seq AS ({_LI_SEQ_SQL})
    SELECT brand, bar_month,
           arg_min(px, o) AS open_e2,
           max(px) AS high_e2,
           min(px) AS low_e2,
           arg_max(px, o) AS close_e2,
           count(*) AS n_trades,
           CAST(sum(qty) AS BIGINT) AS volume
    FROM seq
    GROUP BY brand, bar_month
    ORDER BY brand, bar_month
    """,
)
def part_brand_ohlc_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly OHLC bars per brand — the canonical market-data rollup,
    as ONE grouped aggregate (operators/finance.py ohlc_bars): min_by/
    max_by carry (order-key, price) pairs through map-side partial
    aggregation, so 100 TB of ticks shuffles only |brands x months| bar
    rows — no window, no self-join, and the O(1) bar state is the same
    associative merge the streaming twin folds in state. Single data
    shuffle (the bar groupBy; part attaches unhinted — estimator/AQE
    broadcasts while it fits) plus the presentation sort."""
    bars = ohlc_bars(
        _li_seq(spark, sf_dir),
        ["brand", "bar_month"],
        "o",
        "px",
        size_col="qty",
    )
    return bars.orderBy("brand", "bar_month")


@register(
    "user_value_ohlc",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0') AS o,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    )
    SELECT user_id,
           arg_min(v, o) AS open_e2,
           max(v) AS high_e2,
           min(v) AS low_e2,
           arg_max(v, o) AS close_e2,
           count(*) AS n_events,
           CAST(sum(v) AS BIGINT) AS sum_e2
    FROM seq GROUP BY user_id ORDER BY user_id
    """,
)
def user_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime OHLC of each user's event values — the batch twin of
    streaming/stateful.py running_ohlc, which must reproduce these rows
    exactly from ANY arrival order (the OHLC state merge is associative
    and commutative, a stronger guarantee than the TWAP twin's ordered
    replay). ONE grouped aggregate over (ts, event_id)-keyed values —
    sum_e2 rides the same agg via extra_aggs, never a second scan+join;
    values may be negative (only the ORDER key needs nonnegativity)."""
    ev = load(spark, "events", sf_dir)
    seq = ev.select(
        "user_id",
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("o"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    return (
        ohlc_bars(
            seq,
            ["user_id"],
            "o",
            "v",
            extra_aggs=[F.sum("v").alias("sum_e2")],
        )
        .withColumnRenamed("n_trades", "n_events")
        .orderBy("user_id")
    )


@register(
    "part_brand_rolling_band",
    oracle=f"""
    WITH seq AS ({_LI_SEQ_SQL}),
    stats AS (
        SELECT brand, px,
               count(px) OVER w AS n,
               sum(px) OVER w AS s,
               sum(px * px) OVER w AS ss
        FROM seq
        WINDOW w AS (PARTITION BY brand ORDER BY o
                     ROWS BETWEEN {ROLL_N} PRECEDING AND 1 PRECEDING)
    ),
    flags AS (
        SELECT brand,
               CASE WHEN n >= {ROLL_MIN} THEN 1 ELSE 0 END AS eval,
               CASE WHEN n >= {ROLL_MIN} AND n * px - s > 0
                     AND (n * px - s) * (n * px - s)
                         > {BAND_K * BAND_K} * (n * ss - s * s)
                    THEN 1 ELSE 0 END AS above,
               CASE WHEN n >= {ROLL_MIN} AND n * px - s < 0
                     AND (n * px - s) * (n * px - s)
                         > {BAND_K * BAND_K} * (n * ss - s * s)
                    THEN 1 ELSE 0 END AS below
        FROM stats
    )
    SELECT brand,
           count(*) AS n_ticks,
           CAST(sum(eval) AS BIGINT) AS n_eval,
           CAST(sum(above) AS BIGINT) AS n_above,
           CAST(sum(below) AS BIGINT) AS n_below
    FROM flags GROUP BY brand ORDER BY brand
    """,
)
def part_brand_rolling_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling price-band breach counter (Bollinger shape) per brand:
    each tick is compared against mean +/- K*sigma of the previous
    ROLL_N ticks — entirely in int64 via the squared inequality
    ``(n*x - S)^2 > K^2 * (n*SS - S^2)`` (both sides are n^2 times the
    float form; no sqrt, no division, no float ever), with sign checks
    picking the breach direction. Pairs with audits.py's RANGE-frame
    rolling 7d: ROWS frame here because tick bands are count-based.

    One window shuffle on brand (the brand rollup reuses its
    partitioning) plus the presentation sort. Int64 headroom: px <= 1e7
    (e2 of a 1e5 price cap), so n*SS <= 20 * 20 * 1e14 = 4e16 and the
    squared diff <= 4e16 — three orders under int64 at any SF (bounds
    set by the price domain and ROLL_N, not by data volume)."""
    seq = _li_seq(spark, sf_dir)
    w = (
        Window.partitionBy("brand")
        .orderBy("o")
        .rowsBetween(-ROLL_N, -1)
    )
    px = F.col("px")
    stats = seq.select(
        "brand",
        px,
        F.count(px).over(w).alias("n"),
        F.sum(px).over(w).alias("s"),
        F.sum(px * px).over(w).alias("ss"),
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    eligible = n >= ROLL_MIN
    diff = n * px - s
    breach = diff * diff > F.lit(BAND_K * BAND_K) * (n * ss - s * s)
    flags = stats.select(
        "brand",
        eligible.cast("long").alias("eval"),
        (eligible & (diff > 0) & breach).cast("long").alias("above"),
        (eligible & (diff < 0) & breach).cast("long").alias("below"),
    )
    return (
        flags.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("eval").alias("n_eval"),
            F.sum("above").alias("n_above"),
            F.sum("below").alias("n_below"),
        )
        .orderBy("brand")
    )


@register(
    "part_brand_ewma_band",
    oracle=f"""
    WITH seq AS ({_LI_SEQ_SQL}),
    folded AS (
        SELECT brand,
               list_reduce(
                   list(struct_pack(
                       n_above := CAST(0 AS BIGINT),
                       n_below := CAST(0 AS BIGINT),
                       dev := CAST(0 AS BIGINT),
                       ewma := px,
                       n := CAST(1 AS BIGINT)) ORDER BY o),
                   (acc, x) -> struct_pack(
                       n_above := acc.n_above + CASE
                           WHEN x.ewma > acc.ewma + {BAND_K} * acc.dev
                           THEN 1 ELSE 0 END,
                       n_below := acc.n_below + CASE
                           WHEN x.ewma < acc.ewma - {BAND_K} * acc.dev
                           THEN 1 ELSE 0 END,
                       dev := (abs(x.ewma - acc.ewma) + 7 * acc.dev + 4)
                              // 8,
                       ewma := (x.ewma + 7 * acc.ewma + 4) // 8,
                       n := acc.n + 1)
               ) AS st
        FROM seq GROUP BY brand
    )
    SELECT brand,
           st.n AS n_ticks,
           st.ewma AS ewma_e2,
           st.dev AS dev_e2,
           st.n_above AS n_above,
           st.n_below AS n_below
    FROM folded ORDER BY brand
    """,
)
def part_brand_ewma_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA price band per brand via an integer-exact FIXED-POINT
    RECURRENCE (operators/finance.py): ewma' = (x + 7*ewma + 4) div 8
    (alpha = 1/8, half-up), dev' the same recurrence over |x - ewma|
    (EWMAD), and each tick counted against prev_ewma +/- 2*prev_dev
    BEFORE the state advances. No float enters at any step, so the
    DuckDB twin — a list_reduce over the identically-ordered tick list —
    reproduces every intermediate exactly. EWMA is sequential by
    definition, so the scale axis is across brands/symbols (each group
    folds independently after one shuffle); per-key memory is the tick
    array, the same per-entity bound every sequence operator documents
    (pattern_run_counts), with streaming the answer for unbounded keys
    (the state is two longs).

    ORACLE HAZARD, pinned here and in ewma_band_state's docstring:
    DuckDB 1.0.0's 2-arg list_reduce evaluates the result struct's
    fields IN PLACE over the accumulator buffer from the 2nd iteration
    on — a later field reading an acc slot an earlier field wrote sees
    the NEW value. Both twins therefore order fields so that no field
    reads a slot written before it within a step (breach counters, then
    dev, then ewma, then n), which is correct under BOTH in-place and
    functional evaluation. The explode-wrapped expansion below keeps
    Catalyst's CollapseProject from inlining the fold once per output
    column (5x the work; a Generator is a projection barrier)."""
    seq = _li_seq(spark, sf_dir)
    ticks = seq.groupBy("brand").agg(
        F.collect_list(F.struct("o", "px")).alias("ticks")
    )
    st = ewma_band_fold(
        F.transform(F.array_sort("ticks"), lambda t: t["px"])
    )
    return (
        ticks.select("brand", F.explode(F.array(st)).alias("st"))
        .select(
            "brand",
            F.col("st.n").alias("n_ticks"),
            F.col("st.ewma").alias("ewma_e2"),
            F.col("st.dev").alias("dev_e2"),
            F.col("st.n_above").alias("n_above"),
            F.col("st.n_below").alias("n_below"),
        )
        .orderBy("brand")
    )


@register(
    "part_brand_max_drawdown",
    oracle=f"""
    WITH seq AS ({_LI_SEQ_SQL}),
    dd AS (
        SELECT brand, px,
               max(px) OVER (PARTITION BY brand ORDER BY o
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - px AS drawdown
        FROM seq
    )
    SELECT brand,
           count(*) AS n_ticks,
           max(px) AS peak_e2,
           max(drawdown) AS max_drawdown_e2
    FROM dd GROUP BY brand ORDER BY brand
    """,
)
def part_brand_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per brand — the canonical risk metric: the
    largest peak-to-trough drop of the price series, via a running
    cummax window (drawdown_i = cummax(px)_i - px_i, all int64; the
    running peak includes the current tick so a fresh high draws down
    zero). One brand-partitioned window shuffle whose partitioning the
    brand rollup reuses, plus the presentation sort — the same
    two-exchange budget as the rolling band, and the frame is a running
    aggregate (O(1) per row), not a buffered window."""
    seq = _li_seq(spark, sf_dir)
    w = (
        Window.partitionBy("brand")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = seq.select(
        "brand",
        F.col("px"),
        (F.max("px").over(w) - F.col("px")).alias("drawdown"),
    )
    return (
        dd.groupBy("brand")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.max("px").alias("peak_e2"),
            F.max("drawdown").alias("max_drawdown_e2"),
        )
        .orderBy("brand")
    )


@register(
    "user_value_ewma_band",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0') AS o,
               CAST(round(value * 100) AS BIGINT) AS px
        FROM events
    ),
    folded AS (
        SELECT user_id,
               list_reduce(
                   list(struct_pack(
                       n_above := CAST(0 AS BIGINT),
                       n_below := CAST(0 AS BIGINT),
                       dev := CAST(0 AS BIGINT),
                       ewma := px,
                       n := CAST(1 AS BIGINT)) ORDER BY o),
                   (acc, x) -> struct_pack(
                       n_above := acc.n_above + CASE
                           WHEN x.ewma > acc.ewma + {BAND_K} * acc.dev
                           THEN 1 ELSE 0 END,
                       n_below := acc.n_below + CASE
                           WHEN x.ewma < acc.ewma - {BAND_K} * acc.dev
                           THEN 1 ELSE 0 END,
                       dev := (abs(x.ewma - acc.ewma) + 7 * acc.dev + 4)
                              // 8,
                       ewma := (x.ewma + 7 * acc.ewma + 4) // 8,
                       n := acc.n + 1)
               ) AS st
        FROM seq GROUP BY user_id
    )
    SELECT user_id,
           st.n AS n_events,
           st.ewma AS ewma_e2,
           st.dev AS dev_e2,
           st.n_above AS n_above,
           st.n_below AS n_below
    FROM folded ORDER BY user_id
    """,
)
def user_value_ewma_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA value band over the events stream — the same
    integer-exact fixed-point fold as part_brand_ewma_band (and the
    same DuckDB list_reduce oracle with the documented field-order
    defense), keyed by user over (ts, event_id) event-time order. This
    is the batch twin of streaming/stateful.py running_ewma_band, which
    replays the identical recurrence in state with exact parity.

    Rounding note: the recurrences use SQL ``div`` (truncation toward
    zero, identical in Spark and DuckDB); for the NONNEGATIVE e2 values
    of this table that equals half-up rounding. A series with negative
    values stays cross-engine exact (both engines truncate), only the
    tie direction below zero changes — the streaming twin emulates the
    same truncation."""
    ev = load(spark, "events", sf_dir)
    seq = ev.select(
        "user_id",
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("o"),
        F.round(F.col("value") * 100).cast("long").alias("px"),
    )
    ticks = seq.groupBy("user_id").agg(
        F.collect_list(F.struct("o", "px")).alias("ticks")
    )
    st = ewma_band_fold(
        F.transform(F.array_sort("ticks"), lambda t: t["px"])
    )
    return (
        ticks.select("user_id", F.explode(F.array(st)).alias("st"))
        .select(
            "user_id",
            F.col("st.n").alias("n_events"),
            F.col("st.ewma").alias("ewma_e2"),
            F.col("st.dev").alias("dev_e2"),
            F.col("st.n_above").alias("n_above"),
            F.col("st.n_below").alias("n_below"),
        )
        .orderBy("user_id")
    )


@register(
    "user_value_max_drawdown",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 12, '0') AS o,
               CAST(round(value * 100) AS BIGINT) AS px
        FROM events
    ),
    dd AS (
        SELECT user_id, px,
               max(px) OVER (PARTITION BY user_id ORDER BY o
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - px AS drawdown
        FROM seq
    )
    SELECT user_id,
           count(*) AS n_events,
           max(px) AS peak_e2,
           max(drawdown) AS max_drawdown_e2
    FROM dd GROUP BY user_id ORDER BY user_id
    """,
)
def user_value_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown of event values — the events-table
    sibling of part_brand_max_drawdown, and the batch twin of
    streaming/stateful.py running_drawdown: the metric is computable
    with O(1) state (running peak + running max drawdown), which is why
    the streaming twin carries exactly two longs. Same single
    brand-window shape: one user-partitioned cummax window whose
    partitioning the rollup reuses, plus the presentation sort."""
    ev = load(spark, "events", sf_dir)
    seq = ev.select(
        "user_id",
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("o"),
        F.round(F.col("value") * 100).cast("long").alias("px"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = seq.select(
        "user_id",
        F.col("px"),
        (F.max("px").over(w) - F.col("px")).alias("drawdown"),
    )
    return (
        dd.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("px").alias("peak_e2"),
            F.max("drawdown").alias("max_drawdown_e2"),
        )
        .orderBy("user_id")
    )
