"""Scale-layout evidence: bucketed co-located joins (shuffle happens at
write time, not query time) and salted skew joins (hot keys spread across
reducers without changing results)."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from financial_data_engineering_spark import plans
from financial_data_engineering_spark.operators import skew
from financial_data_engineering_spark.tables import load
from financial_data_engineering_spark.transform.bucketed import (
    read_table,
    write_bucketed,
)

SF_DIR = "/root/testdata/sf0.001"


class TestBucketedJoin:
    def test_bucketed_smj_runs_without_exchange(self, spark):
        """Both sides written bucketed on the join key with the same
        bucket count: the sort-merge join's required distribution is
        satisfied by the scan itself, so the plan has ZERO Exchange
        nodes — the whole point of paying the shuffle once at write
        time. (merge hint pins SMJ so the tiny test tables don't take
        the broadcast path that sidesteps bucketing entirely.)"""
        suffix = uuid.uuid4().hex[:8]
        t_orders, t_cust = f"b_orders_{suffix}", f"b_cust_{suffix}"
        try:
            write_bucketed(
                load(spark, "orders", SF_DIR),
                t_orders,
                ["o_custkey"],
                4,
                sort_keys=["o_custkey"],
            )
            write_bucketed(
                load(spark, "customer", SF_DIR),
                t_cust,
                ["c_custkey"],
                4,
                sort_keys=["c_custkey"],
            )
            joined = (
                read_table(spark, t_orders)
                .hint("merge")
                .join(
                    read_table(spark, t_cust),
                    F.col("o_custkey") == F.col("c_custkey"),
                )
                .select("o_orderkey", "c_name", "o_totalprice")
            )
            assert plans.sortmerge_join_count(joined) == 1
            assert plans.shuffle_count(joined) == 0
            # and it still computes the right thing
            expected = (
                load(spark, "orders", SF_DIR)
                .join(
                    load(spark, "customer", SF_DIR),
                    F.col("o_custkey") == F.col("c_custkey"),
                )
                .count()
            )
            assert joined.count() == expected
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
            spark.sql(f"DROP TABLE IF EXISTS {t_cust}")

    def test_unbucketed_baseline_shuffles(self, spark):
        """Counter-evidence: the same merge join over plain parquet scans
        needs an Exchange per side."""
        joined = (
            load(spark, "orders", SF_DIR)
            .hint("merge")
            .join(
                load(spark, "customer", SF_DIR),
                F.col("o_custkey") == F.col("c_custkey"),
            )
        )
        assert plans.shuffle_count(joined) >= 2


class TestSaltedJoin:
    @pytest.fixture()
    def skewed(self, spark):
        # 10k rows, 95% share one hot key — the shape that straggles
        return spark.range(10_000).select(
            F.when(F.col("id") % 20 != 0, F.lit(1))
            .otherwise(F.col("id"))
            .alias("k"),
            F.col("id").alias("payload"),
        )

    @pytest.fixture()
    def dim(self, spark):
        return spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )

    def test_salted_join_matches_plain_join(self, spark, skewed, dim):
        plain = skewed.join(dim, ["k"]).select("k", "payload", "attr")
        salted = skew.salted_join(skewed, dim, ["k"], n_salts=8).select(
            "k", "payload", "attr"
        )
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_salt_spreads_the_hot_key(self, spark, skewed):
        salted = skew.with_salt(skewed, 8, exclude=["k"])
        spread = (
            salted.filter(F.col("k") == 1)
            .select(skew.SALT_COL)
            .distinct()
            .count()
        )
        assert spread == 8  # hot key now lands on 8 reducers, not 1

    def test_left_join_preserved_and_outer_rejected(self, spark, skewed, dim):
        half_dim = dim.filter(F.col("k") % 2 == 0)
        plain = skewed.join(half_dim, ["k"], "left").count()
        salted = skew.salted_join(skewed, half_dim, ["k"], n_salts=4, how="left")
        assert salted.count() == plain
        with pytest.raises(ValueError):
            skew.salted_join(skewed, dim, ["k"], how="full")
