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


class TestClusteredLayout:
    """write_clustered_parquet: the footer-level evidence that range
    clustering makes parquet min/max stats selective — per-file key
    ranges must not overlap, so a point predicate's stats-eligible file
    set is exactly one file (vs ~all files unclustered)."""

    def test_file_key_ranges_disjoint_and_sorted(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from financial_data_engineering_spark.transform.clustered import (
            write_clustered_parquet,
        )

        df = spark.range(0, 20_000).select(
            (F.col("id") % 997).alias("user_id"),
            F.col("id").alias("payload"),
        )
        out = str(tmp_path / "clustered")
        write_clustered_parquet(df, out, ["user_id"], num_files=8)

        ranges = []
        for f in glob.glob(f"{out}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                col = meta.row_group(rg).column(0)
                assert col.path_in_schema == "user_id"
                assert col.statistics is not None
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            if mins:
                ranges.append((min(mins), max(maxs)))
        assert len(ranges) > 1  # actually split across files
        ranges.sort()
        for (lo_a, hi_a), (lo_b, _) in zip(ranges, ranges[1:]):
            assert hi_a <= lo_b  # no overlap between file key ranges

        # point predicate: exactly one file's [min,max] admits the key
        key = 500
        eligible = [r for r in ranges if r[0] <= key <= r[1]]
        assert len(eligible) == 1

    def test_unclustered_baseline_overlaps_everywhere(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        df = spark.range(0, 20_000).select(
            (F.col("id") % 997).alias("user_id"),
            F.col("id").alias("payload"),
        )
        out = str(tmp_path / "plain")
        df.repartition(8).write.mode("overwrite").parquet(out)
        ranges = []
        for f in glob.glob(f"{out}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            if meta.num_rows == 0:
                continue
            st = meta.row_group(0).column(0).statistics
            ranges.append((st.min, st.max))
        key = 500
        eligible = [r for r in ranges if r[0] <= key <= r[1]]
        # round-robin placement: the key is stats-eligible in EVERY file
        assert len(eligible) == len(ranges) > 1


class TestZorderedLayout:
    """write_zordered_parquet: footer-level evidence that Morton
    clustering makes min/max stats selective on BOTH dimensions, where
    a linear sort is selective only on its leading column."""

    @staticmethod
    def _file_ranges(path, col_index):
        import glob

        import pyarrow.parquet as pq

        ranges = []
        for f in glob.glob(f"{path}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            if meta.num_rows == 0:
                continue
            mins, maxs = [], []
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(col_index).statistics
                assert st is not None
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        return ranges

    @pytest.fixture()
    def grid(self, spark):
        # uniform 100x100 grid, one row per cell
        return spark.range(0, 10_000).select(
            (F.col("id") % 100).alias("x"),
            (F.col("id") / 100).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )

    def test_zorder_prunes_both_dims(self, spark, tmp_path, grid):
        from financial_data_engineering_spark.transform.clustered import (
            write_zordered_parquet,
        )

        out = str(tmp_path / "zordered")
        write_zordered_parquet(grid, out, "x", "y", num_files=16)
        x_ranges = self._file_ranges(out, 0)
        y_ranges = self._file_ranges(out, 1)
        assert len(x_ranges) == 16
        # helper columns must not leak into the written schema
        import glob

        import pyarrow.parquet as pq

        names = pq.ParquetFile(glob.glob(f"{out}/*.parquet")[0]).schema.names
        assert names == ["x", "y", "payload"]
        # point predicates on EITHER dim are stats-eligible in well
        # under half the files (contiguous morton ranges cover compact
        # rectangles; exact counts depend on range-sampling boundaries)
        for key, ranges in ((37, x_ranges), (41, y_ranges)):
            eligible = [r for r in ranges if r[0] <= key <= r[1]]
            assert 1 <= len(eligible) <= len(ranges) // 2

    def test_linear_sort_baseline_reads_everything_on_trailing_dim(
        self, spark, tmp_path, grid
    ):
        from financial_data_engineering_spark.transform.clustered import (
            write_clustered_parquet,
        )

        out = str(tmp_path / "xsorted")
        write_clustered_parquet(grid, out, ["x"], num_files=16)
        y_ranges = self._file_ranges(out, 1)
        eligible = [r for r in y_ranges if r[0] <= 41 <= r[1]]
        # every file spans the whole y domain
        assert len(eligible) == len(y_ranges) > 1


class TestZorderModelVsFooters:
    """The r9 verdict's remaining layout ask: the arithmetic skipping
    MODEL (operators/zorder.py layout_skipping_stats, which the
    lineitem_zorder_skipping query gates) verified against the REAL
    parquet footers of a write_zordered_parquet output — layout claims
    stop being model-only."""

    def test_predicted_skipping_equals_footer_derived(
        self, spark, tmp_path
    ):
        import glob

        import pyarrow.parquet as pq

        from financial_data_engineering_spark.operators.zorder import (
            Z_BITS,
            Z_FILE_SHIFT,
            cell_histogram,
            layout_skipping_stats,
            morton_interleave,
        )
        from financial_data_engineering_spark.transform.clustered import (
            write_zordered_parquet,
        )

        # 16x16 grid with 4 rows per cell and x,y in [0, 2^Z_BITS):
        # the bucketizer is the identity, so the model's uniform
        # cell->file assignment is exactly realizable by the writer.
        side = 1 << Z_BITS
        grid = spark.range(0, side * side * 4).select(
            (F.col("id") % side).alias("x"),
            ((F.col("id") / side).cast("long") % side).alias("y"),
            F.col("id").alias("payload"),
        )
        n_files = 1 << (2 * Z_BITS - Z_FILE_SHIFT)
        cells = cell_histogram(grid, F.col("x"), F.col("y"))
        model = {
            r["dim"]: (r["n_files"], r["files_scanned"], r["rows_scanned"])
            for r in layout_skipping_stats(
                cells,
                "zorder",
                morton_interleave(F.col("bx"), F.col("by"), Z_BITS),
                Z_FILE_SHIFT,
            ).collect()
        }

        out = str(tmp_path / "zordered")
        write_zordered_parquet(
            grid, out, "x", "y", bits=Z_BITS, num_files=n_files
        )
        for col_index, dim in ((0, "bx"), (1, "by")):
            nf, spans, rows_scanned = 0, 0, 0
            for f in glob.glob(f"{out}/*.parquet"):
                meta = pq.ParquetFile(f).metadata
                if meta.num_rows == 0:
                    continue
                nf += 1
                mins, maxs = [], []
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(col_index).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                span = max(maxs) - min(mins) + 1
                spans += span
                rows_scanned += meta.num_rows * span
            # model == reality, exactly: same file count, same total
            # file opens over all slice queries, same rows read
            assert (nf, spans, rows_scanned) == model[dim]
