"""SQL surface passthrough tests — the §2.B rows that are commands or
sources rather than row-producing queries: DDL, metadata commands,
EXPLAIN, CACHE, CSV/JSON sources, INSERT/CTAS, TABLESAMPLE, and the
UDF/UDTF registration surface."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_sql_server_spark.session import load_table, register_tables
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_tables(spark, SF_SMOKE)
    yield


class TestMetadataCommands:
    def test_show_tables(self, spark):
        names = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
        assert {"orders", "lineitem", "nation"} <= names

    def test_show_columns(self, spark):
        cols = [r.col_name for r in spark.sql("SHOW COLUMNS IN nation").collect()]
        assert cols == ["n_nationkey", "n_name", "n_regionkey"]

    def test_describe_table(self, spark):
        rows = spark.sql("DESCRIBE nation").collect()
        assert {(r.col_name, r.data_type) for r in rows} >= {
            ("n_nationkey", "int"),
            ("n_name", "string"),
        }

    def test_describe_query(self, spark):
        rows = spark.sql("DESCRIBE QUERY SELECT 1 AS a, 'x' AS b").collect()
        assert [(r.col_name, r.data_type) for r in rows] == [
            ("a", "int"),
            ("b", "string"),
        ]

    def test_show_functions(self, spark):
        names = {r.function for r in spark.sql("SHOW FUNCTIONS LIKE 'co*'").collect()}
        assert "concat" in names

    def test_explain_formatted(self, spark):
        out = spark.sql(
            "EXPLAIN FORMATTED SELECT count(*) FROM lineitem WHERE l_orderkey = 5"
        ).collect()[0][0]
        assert "PushedFilters" in out  # predicate reached the parquet scan
        assert "HashAggregate" in out

    def test_explain_cost(self, spark):
        out = spark.sql("EXPLAIN COST SELECT 1").collect()[0][0]
        assert "sizeInBytes" in out


class TestDDLAndSinks:
    def test_ctas_and_insert(self, spark, tmp_path):
        spark.sql("DROP TABLE IF EXISTS t_ctas")
        spark.sql(
            f"""CREATE TABLE t_ctas USING parquet
                LOCATION '{tmp_path}/t_ctas'
                AS SELECT n_nationkey AS k, n_name AS v FROM nation WHERE n_nationkey < 3"""
        )
        assert spark.table("t_ctas").count() == 3
        spark.sql("INSERT INTO t_ctas VALUES (99, 'NEW')")
        assert spark.table("t_ctas").count() == 4
        spark.sql("INSERT OVERWRITE t_ctas SELECT 1, 'only'")
        assert spark.table("t_ctas").count() == 1
        spark.sql("DROP TABLE t_ctas")

    def test_create_view(self, spark):
        spark.sql(
            "CREATE OR REPLACE TEMPORARY VIEW big_orders AS "
            "SELECT * FROM orders WHERE o_totalprice > 100000"
        )
        assert spark.table("big_orders").count() > 0
        spark.sql("DROP VIEW big_orders")

    def test_cache_uncache(self, spark):
        spark.sql("CACHE TABLE nation")
        assert spark.catalog.isCached("nation")
        spark.sql("UNCACHE TABLE nation")
        assert not spark.catalog.isCached("nation")

    def test_csv_source_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "nation_csv")
        load_table(spark, SF_SMOKE, "nation").write.option("header", True).csv(path)
        spark.sql(
            f"""CREATE OR REPLACE TEMPORARY VIEW nation_csv
                (n_nationkey INT, n_name STRING, n_regionkey INT)
                USING csv OPTIONS (path '{path}', header 'true')"""
        )
        assert spark.table("nation_csv").count() == 25
        spark.sql("DROP VIEW nation_csv")

    def test_json_source_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "region_json")
        load_table(spark, SF_SMOKE, "region").write.json(path)
        df = spark.read.json(path)
        assert df.count() == 5

    def test_orc_source_roundtrip(self, spark, tmp_path):
        path = str(tmp_path / "nation_orc")
        load_table(spark, SF_SMOKE, "nation").write.orc(path)
        spark.sql(
            f"""CREATE OR REPLACE TEMPORARY VIEW nation_orc
                USING orc OPTIONS (path '{path}')"""
        )
        got = spark.sql(
            "SELECT count(*) AS n, min(n_nationkey) AS lo, max(n_nationkey) AS hi "
            "FROM nation_orc"
        ).first()
        assert (got.n, got.lo, got.hi) == (25, 0, 24)
        # predicate pushdown works against ORC too
        assert spark.table("nation_orc").filter("n_nationkey = 7").count() == 1
        spark.sql("DROP VIEW nation_orc")

    def test_tablesample(self, spark):
        n = spark.sql(
            "SELECT count(*) AS n FROM lineitem TABLESAMPLE (10 PERCENT)"
        ).collect()[0].n
        assert 0 < n < 6000

    def test_tablesample_rows(self, spark):
        n = spark.sql(
            "SELECT count(*) AS n FROM lineitem TABLESAMPLE (7 ROWS)"
        ).collect()[0].n
        assert n == 7

    def test_show_partitions(self, spark, tmp_path):
        spark.sql("DROP TABLE IF EXISTS orders_part")
        spark.sql(
            f"""CREATE TABLE orders_part USING parquet
                PARTITIONED BY (o_orderstatus)
                LOCATION '{tmp_path}/orders_part'
                AS SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"""
        )
        parts = {r.partition for r in spark.sql("SHOW PARTITIONS orders_part").collect()}
        assert parts == {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}
        spark.sql("DROP TABLE orders_part")

    def test_create_table_like(self, spark, tmp_path):
        spark.sql("DROP TABLE IF EXISTS nation_like")
        spark.sql(
            f"CREATE TABLE nation_like LIKE nation LOCATION '{tmp_path}/nation_like'"
        )
        assert spark.table("nation_like").schema == spark.table("nation").schema
        assert spark.table("nation_like").count() == 0  # structure only
        spark.sql("DROP TABLE nation_like")

    def test_analyze_table_stats(self, spark, tmp_path):
        spark.sql("DROP TABLE IF EXISTS region_stats")
        spark.sql(
            f"""CREATE TABLE region_stats USING parquet
                LOCATION '{tmp_path}/region_stats'
                AS SELECT * FROM region"""
        )
        spark.sql("ANALYZE TABLE region_stats COMPUTE STATISTICS")
        spark.conf.set("spark.sql.cbo.enabled", "true")  # surface rowCount
        try:
            cost = spark.sql(
                "EXPLAIN COST SELECT * FROM region_stats"
            ).collect()[0][0]
        finally:
            spark.conf.set("spark.sql.cbo.enabled", "false")
        assert "rowCount=5" in cost  # CBO sees the analyzed stats
        spark.sql("DROP TABLE region_stats")

    def test_describe_function(self, spark):
        rows = spark.sql("DESCRIBE FUNCTION concat").collect()
        text = " ".join(r.function_desc for r in rows)
        assert "concat" in text


class TestUdfSurface:
    def test_python_udf_registration(self, spark):
        # CREATE TEMPORARY FUNCTION analogue (§2.B UDF surface)
        spark.udf.register("double_it", lambda x: x * 2, T.LongType())
        out = spark.sql("SELECT double_it(n_nationkey) AS d FROM nation ORDER BY d DESC")
        assert out.collect()[0].d == 48

    def test_pandas_udaf(self, spark):
        import pandas as pd
        from pyspark.sql.functions import PandasUDFType, pandas_udf

        @pandas_udf("double", PandasUDFType.GROUPED_AGG)
        def mean_udaf(v: pd.Series) -> float:
            return float(v.mean())

        spark.udf.register("mean_udaf", mean_udaf)
        got = spark.sql(
            "SELECT mean_udaf(l_quantity) AS m FROM lineitem"
        ).collect()[0].m
        exact = spark.sql("SELECT avg(l_quantity) AS m FROM lineitem").collect()[0].m
        assert abs(got - exact) < 1e-9

    def test_python_udtf(self, spark):
        # Python UDTFs (Spark 3.5+): LATERAL-style table function
        from pyspark.sql.functions import udtf

        @udtf(returnType="word: string, n: int")
        class Splitter:
            def eval(self, text: str):
                for w in text.split(" "):
                    yield w, len(w)

        spark.udtf.register("splitter", Splitter)
        rows = spark.sql("SELECT * FROM splitter('a bb ccc')").collect()
        assert [(r.word, r.n) for r in rows] == [("a", 1), ("bb", 2), ("ccc", 3)]

    def test_lateral_join_udtf(self, spark):
        from pyspark.sql.functions import udtf

        rows = spark.sql(
            """SELECT n_name, s.word FROM nation,
               LATERAL splitter(n_name) s
               WHERE n_nationkey = 0"""
        ).collect()
        assert rows[0].word == "NATION_0"
