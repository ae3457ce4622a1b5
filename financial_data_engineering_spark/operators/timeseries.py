"""Time-series gap filling: daily spine + last-observation-carried-forward.

The reference's domain is indicator time series (World Bank annual
observations, Open-Meteo daily arrays — reference src/extractors/
world_bank.py:138-151, open_meteo.py:114-134), where missing periods are
the norm; LOCF over a generated calendar spine is the standard repair
before any rolling computation.

Scale shape: the naive implementation builds a (entity × calendar) spine
table and LEFT JOINs observations onto it — two shuffles of a frame
LARGER than the data, plus a join. This operator instead lets each
observed row fill forward to the day before the entity's next observation
(``lead`` + ``sequence`` + ``explode``):

- one shuffle to the per-entity window (the ``lead``);
- the fill-out is a map-side explode — no spine join, no second shuffle;
- output size is exactly the filled calendar, same as the join plan.

Each observation emits ``[day, next_day)`` days, so the LOCF semantics
(value holds until the next observation; the series ends at the last
observed day) hold by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def locf_daily_fill(
    daily: DataFrame,
    entity_col: str,
    day_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Fill per-entity daily gaps, carrying every value column forward.

    ``daily`` must hold at most one row per (entity, day) — aggregate
    first. Output columns: ``entity_col``, ``day_col`` (now gap-free from
    each entity's first to last observed day), ``value_cols`` (carried
    forward), and ``is_gap`` (1 on generated rows, 0 on observed ones).
    """
    w = Window.partitionBy(entity_col).orderBy(day_col)
    nxt = daily.withColumn("_next_day", F.lead(day_col).over(w))
    # Last reachable fill day: the day before the next observation, or the
    # observation's own day for the final row (series ends at last obs).
    end = F.coalesce(F.date_sub("_next_day", 1), F.col(day_col))
    fanned = nxt.select(
        F.col(entity_col),
        F.col(day_col).alias("_obs_day"),
        F.explode(F.sequence(F.col(day_col), end)).alias("_fill_day"),
        *[F.col(c) for c in value_cols],
    )
    return fanned.select(
        F.col(entity_col),
        F.col("_fill_day").alias(day_col),
        *[F.col(c) for c in value_cols],
        (F.col("_fill_day") > F.col("_obs_day")).cast("int").alias("is_gap"),
    )
