"""Star-schema builder, date dimension, and key functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_engineering_spark.functions.keys import date_key, surrogate_key
from financial_data_engineering_spark.tables import load
from financial_data_engineering_spark.transform import (
    StarSchemaBuilder,
    build_date_dimension,
)
from tests.conftest import SF_SMALL


def test_surrogate_key_matches_reference_scheme(spark):
    # hashlib.md5(b'ALGERIA|0').hexdigest()[:12]
    import hashlib

    expected = hashlib.md5(b"ALGERIA|0").hexdigest()[:12]
    df = spark.createDataFrame([("ALGERIA", 0)], "name string, key int")
    row = df.select(surrogate_key(F.col("name"), F.col("key")).alias("sk")).collect()[0]
    assert row["sk"] == expected


def test_date_key_int_yyyymmdd(spark):
    df = spark.createDataFrame([("2024-03-07 10:30:00",)], "d string")
    assert df.select(date_key(F.col("d")).alias("k")).collect()[0]["k"] == 20240307


def test_date_dimension_attributes(spark):
    df = spark.createDataFrame([("2024-01-06",), ("2024-01-08",), ("2024-01-06",)], "d string")
    rows = {r["date_key"]: r for r in build_date_dimension(df, "d").collect()}
    assert set(rows) == {20240106, 20240108}
    sat = rows[20240106]
    assert sat["is_weekend"] is True
    assert sat["day_of_week"] == "Saturday"
    assert sat["month_name"] == "January"
    assert sat["quarter"] == 1
    mon = rows[20240108]
    assert mon["is_weekend"] is False


def test_star_schema_build_and_integrity(spark, tmp_path):
    orders = load(spark, "orders", SF_SMALL)
    customer = load(spark, "customer", SF_SMALL)

    dim_customer = customer.select(
        surrogate_key(F.col("c_name"), F.col("c_custkey")).alias("customer_sk"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
    )
    dim_date = build_date_dimension(orders, "o_orderdate")
    fact = (
        orders.join(F.broadcast(dim_customer), orders.o_custkey == dim_customer.c_custkey)
        .select(
            "o_orderkey",
            date_key(F.col("o_orderdate")).alias("date_key"),
            "customer_sk",
            "o_totalprice",
        )
    )

    builder = (
        StarSchemaBuilder("sales", str(tmp_path))
        .add_dimension("dim_customer", natural_keys=["c_custkey"])
        .add_dimension("dim_date", natural_keys=["date"])
        .add_fact(
            "fact_orders",
            measures=["o_totalprice"],
            dimension_keys=["date_key", "customer_sk"],
        )
    )
    result = builder.build(
        {"dim_customer": dim_customer, "dim_date": dim_date, "fact_orders": fact}
    )
    assert result.success, result.error
    assert result.rows_by_table["fact_orders"] == orders.count()
    assert result.rows_by_table["dim_customer"] == customer.count()
    assert (tmp_path / "fact_orders").exists()

    orphans = builder.validate_referential_integrity()
    assert orphans["fact_orders.date_key->dim_date"] == 0
    assert orphans["fact_orders.customer_sk->dim_customer"] == 0


def test_star_schema_build_missing_table_is_error_result(spark, tmp_path):
    builder = StarSchemaBuilder("x", str(tmp_path)).add_dimension("dim_missing")
    result = builder.build({})
    assert not result.success
    assert "dim_missing" in result.error
