"""Loader/testdata shape contract. The r3 red-row root cause was a silent
mismatch between the driver's parquet physical types and the loader's
assumptions (events.ts read as nanosecond int64 when the file stores
timestamp[us], compressing 30 days into 43 minutes). These tests make that
bug class fail loudly in pytest instead of surfacing only in the oracle
gate.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_data_engineering_spark.schemas import SCHEMAS, TPCH_TABLES
from financial_data_engineering_spark.tables import load
from tests.conftest import SF_SMALL


def test_events_ts_is_native_timestamp(spark):
    df = load(spark, "events", SF_SMALL)
    assert df.schema["ts"].dataType == T.TimestampType()


def test_events_ts_range_is_plausible(spark):
    """The driver generates events across 2024-01; a unit-scale bug (ns/us/
    ms confusion) lands decades away from that, so a year assertion is a
    robust tripwire."""
    row = load(spark, "events", SF_SMALL).agg(
        F.min(F.year("ts")).alias("ymin"), F.max(F.year("ts")).alias("ymax")
    ).first()
    assert row["ymin"] >= 2000, "events.ts collapsed toward the epoch — unit bug"
    assert row["ymax"] <= 2100, "events.ts exploded into the far future — unit bug"


def test_events_ts_spans_days_not_minutes(spark):
    """30 days of events must span days after load; the ns-as-us bug
    shrank the whole range to ~43 minutes."""
    row = load(spark, "events", SF_SMALL).agg(
        (
            F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))
        ).alias("span_us")
    ).first()
    assert row["span_us"] > 7 * 24 * 3600 * 1_000_000, "events span < 1 week"


@pytest.mark.parametrize("name", TPCH_TABLES)
def test_declared_schema_matches_parquet_columns(name, spark):
    """Every declared column must exist in the physical file with a
    compatible arrow type family — catches loader/testdata drift for ALL
    tables, not just events."""
    physical = pq.read_schema(f"{SF_SMALL}/{name}.parquet")
    phys_names = set(physical.names)
    for field in SCHEMAS[name].fields:
        assert field.name in phys_names, f"{name}.{field.name} missing from parquet"

    # Timestamp columns specifically: declared TimestampType must be backed
    # by a parquet timestamp (any sub-second unit), never a raw int64.
    for field in SCHEMAS[name].fields:
        if field.dataType == T.TimestampType():
            arrow_type = physical.field(field.name).type
            assert str(arrow_type).startswith("timestamp"), (
                f"{name}.{field.name} declared TimestampType but parquet "
                f"stores {arrow_type}"
            )


def test_load_row_counts_match_parquet_metadata(spark):
    """Schema-applied load must not drop or duplicate rows."""
    for name in TPCH_TABLES:
        meta_rows = pq.ParquetFile(f"{SF_SMALL}/{name}.parquet").metadata.num_rows
        assert load(spark, name, SF_SMALL).count() == meta_rows
