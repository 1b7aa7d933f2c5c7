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
