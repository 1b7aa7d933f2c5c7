"""pg_catalog emulation tests — the metadata SQL shapes psql/JDBC issue
(mirrors the reference's PsqlCommandsSuite intent)."""

from __future__ import annotations

import pytest

from spark_sql_server_spark.catalog import (
    init_pg_catalog,
    init_system_functions,
    refresh_runtime_catalog,
)
from spark_sql_server_spark.dialect.rewriter import rewrite_sql


@pytest.fixture(scope="module", autouse=True)
def catalog(spark):
    init_pg_catalog(spark)
    init_system_functions(spark)
    yield


class TestVersionFunction:
    def test_version_is_pg_style(self, spark):
        # ORMs regex "PostgreSQL X.Y" out of version() on connect
        # (SQLAlchemy's postgresql dialect does SELECT version());
        # the registered UDF shadows Spark's build-string version()
        v = spark.sql("SELECT version() AS v").collect()[0].v
        assert v.startswith("PostgreSQL 9.6.0")
        assert "Apache Spark" in v


class TestCatalogTables:
    def test_all_tables_exist(self, spark):
        from spark_sql_server_spark.catalog.pg_catalog import CATALOG_TABLE_SCHEMAS

        for name in CATALOG_TABLE_SCHEMAS:
            assert spark.catalog.tableExists(f"pg_catalog.{name}"), name

    def test_pg_type_has_core_types(self, spark):
        rows = spark.sql(
            "SELECT typname FROM pg_catalog.pg_type WHERE oid IN (16, 20, 23, 701, 1043)"
        ).collect()
        assert {r.typname for r in rows} == {"bool", "int8", "int4", "float8", "varchar"}

    def test_pg_namespace_via_bare_name(self, spark):
        # JDBC drivers reference bare `pg_namespace` (AstBuilder.scala:1186-1221)
        rows = spark.sql(rewrite_sql("SELECT nspname FROM pg_namespace")).collect()
        # r10: the pg_catalog namespace row joined the spark one
        assert {r.nspname for r in rows} == {"spark", "pg_catalog"}

    def test_pg_database_lists_default(self, spark):
        names = {r.datname for r in spark.sql(
            "SELECT datname FROM pg_catalog.pg_database"
        ).collect()}
        assert "default" in names

    def test_pg_class_reflects_temp_views(self, spark):
        spark.range(3).createOrReplaceTempView("catalog_probe_view")
        refresh_runtime_catalog(spark)
        rows = spark.sql(
            "SELECT relname FROM pg_catalog.pg_class WHERE relname = 'catalog_probe_view'"
        ).collect()
        assert len(rows) == 1
        attrs = spark.sql(
            """SELECT a.attname FROM pg_catalog.pg_attribute a
               JOIN pg_catalog.pg_class c ON a.attrelid = c.oid
               WHERE c.relname = 'catalog_probe_view'"""
        ).collect()
        assert [a.attname for a in attrs] == ["id"]


class TestSystemFunctions:
    def test_format_type(self, spark):
        assert spark.sql("SELECT format_type(23, NULL) AS t").collect()[0].t == "int4"

    def test_current_schemas(self, spark):
        assert spark.sql(
            "SELECT current_schemas(false) AS s"
        ).collect()[0].s == ["spark"]

    def test_array_to_string(self, spark):
        assert (
            spark.sql("SELECT array_to_string(array('a','b'), ',') AS s").collect()[0].s
            == "a,b"
        )

    def test_array_upper(self, spark):
        assert spark.sql(
            "SELECT array_upper(current_schemas(false), 1) AS n"
        ).collect()[0].n == 1

    def test_visibility_checks(self, spark):
        row = spark.sql(
            "SELECT pg_table_is_visible(1247) AS a, pg_table_is_visible(99999) AS b"
        ).collect()[0]
        assert row.a is False and row.b is True

    def test_oidvectortypes(self, spark):
        assert (
            spark.sql("SELECT oidvectortypes(array(23, 1043)) AS s").collect()[0].s
            == "int4, varchar"
        )

    def test_regtype_cast_through_rewriter(self, spark):
        out = spark.sql(rewrite_sql("SELECT format_type(701, NULL) AS t")).collect()
        assert out[0].t == "float8"


class TestJdbcMetadataShapes:
    def test_typinput_lookup(self, spark):
        """The pg_type probe the PG JDBC driver sends on connect
        (quoted at reference catalog.scala:289-307), dialect-rewritten."""
        sql = """
            SELECT typinput='array_in'::regproc AS is_array, typtype
            FROM pg_catalog.pg_type
            WHERE typname = 'int4'
        """
        rows = spark.sql(rewrite_sql(sql)).collect()
        assert len(rows) == 1
        assert rows[0].is_array is False
        assert rows[0].typtype == "b"

    def test_get_type_info_shape(self, spark):
        """DatabaseMetaData.getTypeInfo's pg_type scan (pgjdbc shape)."""
        sql = """
            SELECT t.typname, t.oid
            FROM pg_catalog.pg_type t
              JOIN pg_catalog.pg_namespace n ON (t.typnamespace = n.oid)
            WHERE n.nspname != 'pg_toast' AND typelem = 0 AND typrelid = 0
        """
        rows = spark.sql(rewrite_sql(sql)).collect()
        names = {r.typname for r in rows}
        assert {"bool", "int4", "int8", "float8", "varchar", "numeric"} <= names
        # arrays have typelem != 0 → excluded, like real PG
        assert not any(n.startswith("_") for n in names)

    def test_namespace_series_join(self, spark):
        """generate_series + array_upper + current_schemas combo from the
        same driver query family — PG 1-based subscripts, as the driver
        writes them (the rewriter maps them to try_element_at)."""
        sql = """
            SELECT s.r, current_schemas(false)[s.r] AS nspname
            FROM generate_series(1, array_upper(current_schemas(false), 1)) AS s(r)
        """
        rows = spark.sql(rewrite_sql(sql)).collect()
        assert rows[0].nspname == "spark"


class TestPgSettings:
    def test_pg_settings_view(self, spark):
        rows = spark.sql(
            "SELECT setting FROM pg_catalog.pg_settings WHERE name = 'timezone'"
        ).collect()
        assert [r["setting"] for r in rows] == ["UTC"]
        all_rows = spark.sql(
            "SELECT name, setting, boot_val, vartype FROM pg_catalog.pg_settings"
        ).collect()
        assert len(all_rows) >= 10
        assert all(r["vartype"] == "string" for r in all_rows)

    def test_current_setting_function(self, spark):
        row = spark.sql(
            "SELECT current_setting('TimeZone') AS tz, "
            "current_setting('server_encoding') AS enc"
        ).collect()[0]
        assert row["tz"] == "UTC" and row["enc"] == "UTF8"
