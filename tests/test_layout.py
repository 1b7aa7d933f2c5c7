"""Layout-lever tests: bucketed joins elide the exchange, partitioned
writes prune, salted joins preserve results while spreading keys."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_sql_server_spark.session import load_table
from spark_sql_server_spark.sources import (
    salted_join,
    write_bucketed,
    write_partitioned,
)
from tests.conftest import SF_SMOKE


class TestBucketing:
    def test_bucketed_join_has_no_exchange(self, spark):
        orders = load_table(spark, SF_SMOKE, "orders")
        li = load_table(spark, SF_SMOKE, "lineitem")
        write_bucketed(orders, "orders_b", ["o_orderkey"], 8, ["o_orderkey"])
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "lineitem_b",
            ["o_orderkey"],
            8,
            ["o_orderkey"],
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("orders_b").join(
                spark.table("lineitem_b"), "o_orderkey"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located buckets: sort-merge join, no shuffle on either side
            assert "SortMergeJoin" in plan, plan
            assert "Exchange" not in plan, plan
            assert joined.count() == li.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE orders_b")
        spark.sql("DROP TABLE lineitem_b")

    def test_unbucketed_join_does_exchange(self, spark):
        # control: the same join over plain parquet shuffles
        orders = load_table(spark, SF_SMOKE, "orders")
        li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = (
                orders.join(li, "o_orderkey")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert "Exchange" in plan


class TestPartitioning:
    def test_partition_pruning(self, spark, tmp_path):
        path = str(tmp_path / "orders_by_status")
        write_partitioned(
            load_table(spark, SF_SMOKE, "orders"), path, ["o_orderstatus"]
        )
        df = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
        # and the result matches the unpartitioned filter
        expect = (
            load_table(spark, SF_SMOKE, "orders")
            .filter(F.col("o_orderstatus") == "F")
            .count()
        )
        assert df.count() == expect


class TestSaltedJoin:
    def test_salted_equals_plain(self, spark):
        li = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders").withColumnRenamed(
            "o_orderkey", "l_orderkey"
        )
        plain = (
            li.join(orders, "l_orderkey")
            .groupBy("o_orderstatus")
            .count()
            .collect()
        )
        salted = (
            salted_join(li, orders, "l_orderkey", salt_buckets=4)
            .groupBy("o_orderstatus")
            .count()
            .collect()
        )
        assert {(r.o_orderstatus, r["count"]) for r in plain} == {
            (r.o_orderstatus, r["count"]) for r in salted
        }

    def test_salt_spreads_hot_key(self, spark):
        # all rows share ONE key — salting must split them across buckets
        hot = spark.range(10000).select(
            F.lit(1).alias("k"), F.col("id").alias("payload")
        )
        small = spark.range(1).select(F.lit(1).alias("k"), F.lit("dim").alias("v"))
        out = salted_join(hot, small, "k", salt_buckets=8)
        assert out.count() == 10000
        # the salted big side occupies >1 salt bucket
        n_buckets = (
            hot.withColumn("__salt", (F.rand(seed=42) * 8).cast("int"))
            .select("__salt")
            .distinct()
            .count()
        )
        assert n_buckets > 4


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — q_zorder_layout + the physical write
# ---------------------------------------------------------------------------

import duckdb

from spark_sql_server_spark.operators import REGISTRY
from spark_sql_server_spark.operators.layout import (
    _Z_BUCKETS,
    _z_expr,
    zorder_write,
)


def _py_morton(a: int, b: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


class TestMorton:
    def test_sql_interleave_matches_python(self):
        con = duckdb.connect()
        cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 64)]
        for a, b in cases:
            got = con.execute(f"SELECT {_z_expr(str(a), str(b))}").fetchone()[0]
            assert got == _py_morton(a, b), (a, b)

    def test_buckets_fix_top_bits_of_both_dims(self):
        # all z-values inside one of the 16 fixed buckets share their
        # top 4 bits, i.e. the top 2 bits of EACH dimension → each
        # bucket spans ≤ 1/4 of each scaled key domain
        width = (1 << 32) // _Z_BUCKETS
        for bucket in (0, 5, 15):
            lo, hi = bucket * width, (bucket + 1) * width - 1
            assert lo >> 28 == hi >> 28 == bucket


class TestManifest:
    def test_all_buckets_narrow_in_both_dims(self, spark):
        rows = REGISTRY["q_zorder_layout"].fn(spark, SF_SMOKE).collect()
        assert 2 <= len(rows) <= _Z_BUCKETS
        pk_rng = max(r["pk_hi"] for r in rows) - min(r["pk_lo"] for r in rows)
        sk_rng = max(r["sk_hi"] for r in rows) - min(r["sk_lo"] for r in rows)
        # z-order: every bucket narrow in BOTH dims (≤ ~half the range,
        # with slack for scaling granularity on small keys)
        for r in rows:
            assert r["pk_hi"] - r["pk_lo"] <= 0.6 * pk_rng
            assert r["sk_hi"] - r["sk_lo"] <= 0.6 * sk_rng
        # contrast: a single-key sort leaves the OTHER dim unclustered —
        # bucket by partkey quartile and suppkey spans stay ~full-range
        data = spark.sql(
            "SELECT l_partkey, l_suppkey FROM lineitem"
        ).collect()
        pk_sorted = sorted(data, key=lambda r: r["l_partkey"])
        quarter = len(pk_sorted) // 4
        spans = []
        for q in range(4):
            chunk = pk_sorted[q * quarter : (q + 1) * quarter]
            sks = [r["l_suppkey"] for r in chunk]
            spans.append(max(sks) - min(sks))
        assert min(spans) > 0.6 * sk_rng  # single-key sort does NOT prune dim 2

    def test_row_total_preserved(self, spark):
        rows = REGISTRY["q_zorder_layout"].fn(spark, SF_SMOKE).collect()
        total = spark.sql("SELECT COUNT(*) AS n FROM lineitem").collect()[0]["n"]
        assert sum(r["n_rows"] for r in rows) == total


class TestPhysicalWrite:
    def test_range_partitioned_files_cluster_both_dims(self, spark, tmp_path):
        out = str(tmp_path / "zorder")
        zorder_write(spark, SF_SMOKE, out)
        from pyspark.sql import functions as F

        per_file = (
            spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("l_partkey").alias("pk_lo"),
                F.max("l_partkey").alias("pk_hi"),
                F.min("l_suppkey").alias("sk_lo"),
                F.max("l_suppkey").alias("sk_hi"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        assert 2 <= len(per_file) <= _Z_BUCKETS
        pk_rng = max(r["pk_hi"] for r in per_file) - min(r["pk_lo"] for r in per_file)
        sk_rng = max(r["sk_hi"] for r in per_file) - min(r["sk_lo"] for r in per_file)
        narrow_pk = sum(1 for r in per_file if r["pk_hi"] - r["pk_lo"] <= 0.7 * pk_rng)
        narrow_sk = sum(1 for r in per_file if r["sk_hi"] - r["sk_lo"] <= 0.7 * sk_rng)
        # sampled range boundaries wobble, so assert bulk behavior, not
        # exact per-file bounds
        assert narrow_pk >= len(per_file) - 2
        assert narrow_sk >= len(per_file) - 2
