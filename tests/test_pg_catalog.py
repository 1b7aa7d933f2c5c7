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


class TestInformationSchema:
    """r10 beyond-reference: SQL-standard information_schema views over
    the pg_catalog emulation — the first thing BI/ELT tools (dbt,
    Metabase, Superset) query. PG itself implements them exactly this
    way (standard views over the system catalogs)."""

    @pytest.fixture(scope="class", autouse=True)
    def _tables(self, spark):
        # the views read the live pg_class — register the base tables
        # in THIS session and sync, like a server connection init does
        from spark_sql_server_spark.session import register_tables
        from tests.conftest import SF_SMOKE

        register_tables(spark, SF_SMOKE)
        refresh_runtime_catalog(spark)
        yield

    def test_tables_lists_user_tables(self, spark):
        rows = spark.sql(
            "SELECT table_name, table_type FROM information_schema.tables "
            "WHERE table_schema = 'spark'"
        ).collect()
        names = {r.table_name for r in rows}
        assert {"orders", "lineitem", "region"} <= names
        assert all(r.table_type == "BASE TABLE" for r in rows
                   if r.table_name == "orders")

    def test_columns_pg_standard_type_spellings(self, spark):
        rows = spark.sql(
            "SELECT column_name, data_type, is_nullable, ordinal_position "
            "FROM information_schema.columns WHERE table_name = 'orders' "
            "ORDER BY ordinal_position"
        ).collect()
        got = {r.column_name: r.data_type for r in rows}
        assert got["o_orderkey"] == "bigint"
        assert got["o_orderstatus"] == "character varying"
        assert got["o_totalprice"] == "double precision"
        assert got["o_orderdate"] == "timestamp without time zone"
        assert [r.ordinal_position for r in rows] == list(range(1, 7))
        assert all(r.is_nullable in ("YES", "NO") for r in rows)

    def test_schemata(self, spark):
        names = {r.schema_name for r in spark.sql(
            "SELECT schema_name FROM information_schema.schemata"
        ).collect()}
        assert {"spark", "pg_catalog"} <= names

    def test_constraint_views_empty(self, spark):
        for v in ("table_constraints", "key_column_usage",
                  "referential_constraints"):
            assert spark.sql(
                f"SELECT count(*) AS n FROM information_schema.{v}"
            ).collect()[0].n == 0

    def test_system_catalogs_listed_in_pg_class(self, spark):
        # r10: the emulated catalogs appear in pg_class under the
        # pg_catalog namespace so pg_class-walking tools see them
        rows = spark.sql(
            "SELECT relname, relkind FROM pg_catalog.pg_class c "
            "JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace "
            "WHERE n.nspname = 'pg_catalog'"
        ).collect()
        by = {r.relname: r.relkind for r in rows}
        assert by.get("pg_type") == "r"
        assert by.get("pg_policy") == "v"  # empty-by-design view
