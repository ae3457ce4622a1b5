"""Date-dimension builder (SURVEY.md §2.J3).

The reference materializes a row per distinct date with nine calendar
attributes via a Python loop (base_transformer.py:63-80); here the whole
dimension is one distinct + projection plan — no driver loop, works on a
billion distinct dates as readily as a hundred.

Weekday-numbering trap (SURVEY §4): python ``weekday() >= 5`` means Sat/Sun;
Spark ``dayofweek`` is 1=Sunday..7=Saturday, so the equivalent predicate is
``dayofweek IN (1, 7)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from financial_data_engineering_spark.functions.keys import date_key


def date_attributes(date_col: Column) -> list[Column]:
    """The nine calendar attribute expressions, from a DateType column."""
    return [
        date_key(date_col).alias("date_key"),
        date_col.alias("date"),
        F.year(date_col).alias("year"),
        F.quarter(date_col).alias("quarter"),
        F.month(date_col).alias("month"),
        F.date_format(date_col, "MMMM").alias("month_name"),
        F.date_format(date_col, "EEEE").alias("day_of_week"),
        F.dayofyear(date_col).alias("day_of_year"),
        F.dayofweek(date_col).isin(1, 7).alias("is_weekend"),
    ]


def build_date_dimension(df: DataFrame, source_col: str) -> DataFrame:
    """Distinct dates of ``source_col`` (date/timestamp/ISO string) → one
    dimension row per date, sorted by date_key."""
    dates = df.select(
        F.to_date(F.substring(F.col(source_col).cast("string"), 1, 10)).alias("__d")
    ).distinct()
    return dates.select(*date_attributes(F.col("__d"))).orderBy("date_key")
