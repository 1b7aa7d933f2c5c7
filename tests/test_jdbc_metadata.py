"""Replay of the exact metadata SQL a PostgreSQL JDBC driver issues,
over the live wire against pg_catalog — the fixture twin of the
reference's PgJdbcSuite DatabaseMetaData tests (PgJdbcSuite.scala:
115-190) and the implicit driver bootstrap query the reference quotes
at catalog.scala:289-307. No pgjdbc jar exists in this sandbox, so the
driver's SQL (public pgjdbc PgDatabaseMetaData source) is replayed
verbatim as fixtures instead."""

from __future__ import annotations

import asyncio

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, rows_of


@pytest.fixture(scope="module")
def server(spark):
    loop = asyncio.new_event_loop()

    async def _run():
        srv = SparkPGServer(
            spark, port=0, pg_catalog=True,
            init_session=lambda s: register_tables(s, SF_SMOKE),
        )
        await srv.start()
        return srv

    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def _simple(server, sql: str):
    srv, loop = server

    async def go():
        c = await PgClient.connect(srv.port)
        msgs = await c.simple(sql)
        await c.close()
        return msgs

    msgs = loop.run_until_complete(go())
    errs = [b for t, b in msgs if t == b"E"]
    assert not errs, f"server error for {sql!r}: {errs[:1]}"
    return rows_of(msgs)


#: the implicit query pgjdbc runs on `getPGType`-style lookups, quoted
#: verbatim by the reference at catalog.scala:294-307 ($1 spliced — the
#: driver sends it with a bound typname)
ARRAY_IN_REGPROC_SQL = """SELECT typinput='array_in'::regproc, typtype
FROM pg_catalog.pg_type
LEFT JOIN (
  select ns.oid as nspoid, ns.nspname, r.r
from pg_namespace as ns
  join (
    select s.r, (current_schemas(false))[s.r] as nspname
from generate_series(1, array_upper(current_schemas(false), 1)) as s(r)
) as r
  using ( nspname )
) as sp
  ON sp.nspoid = typnamespace
WHERE typname = '{typ}'
ORDER BY sp.r, pg_type.oid DESC LIMIT 1"""


#: pgjdbc PgDatabaseMetaData.getTypeInfo() base-type query (the driver
#: synthesizes array/serial entries itself from typelem)
GET_TYPE_INFO_SQL = (
    "SELECT t.typname,t.oid FROM pg_catalog.pg_type t "
    "JOIN pg_catalog.pg_namespace n ON (t.typnamespace = n.oid) "
    "WHERE n.nspname != 'pg_toast' AND typelem = 0 AND typrelid = 0"
)


#: pgjdbc PgDatabaseMetaData.getTables() — the full CASE ladder the
#: driver renders, with the TABLE-type filter clause it appends
GET_TABLES_SQL = """SELECT NULL AS TABLE_CAT, n.nspname AS TABLE_SCHEM, c.relname AS TABLE_NAME,
 CASE n.nspname ~ '^pg_' OR n.nspname = 'information_schema'
 WHEN true THEN CASE
   WHEN n.nspname = 'pg_catalog' OR n.nspname = 'information_schema' THEN CASE c.relkind
    WHEN 'r' THEN 'SYSTEM TABLE' WHEN 'v' THEN 'SYSTEM VIEW' WHEN 'i' THEN 'SYSTEM INDEX' ELSE NULL END
   WHEN n.nspname = 'pg_toast' THEN CASE c.relkind
    WHEN 'r' THEN 'SYSTEM TOAST TABLE' WHEN 'i' THEN 'SYSTEM TOAST INDEX' ELSE NULL END
   ELSE CASE c.relkind WHEN 'r' THEN 'TEMPORARY TABLE' WHEN 'i' THEN 'TEMPORARY INDEX' WHEN 'S' THEN 'TEMPORARY SEQUENCE' WHEN 'v' THEN 'TEMPORARY VIEW' ELSE NULL END END
 WHEN false THEN CASE c.relkind
   WHEN 'r' THEN 'TABLE' WHEN 'i' THEN 'INDEX' WHEN 'S' THEN 'SEQUENCE' WHEN 'v' THEN 'VIEW' WHEN 'c' THEN 'TYPE' WHEN 'f' THEN 'FOREIGN TABLE' WHEN 'm' THEN 'MATERIALIZED VIEW' ELSE NULL END
 ELSE NULL END AS TABLE_TYPE, d.description AS REMARKS
 FROM pg_catalog.pg_namespace n, pg_catalog.pg_class c
 LEFT JOIN pg_catalog.pg_description d ON (c.oid = d.objoid AND d.objsubid = 0)
 WHERE c.relnamespace = n.oid AND c.relname LIKE '{pat}'
 AND (false OR ( c.relkind = 'r' AND n.nspname !~ '^pg_' AND n.nspname <> 'information_schema' ))
 ORDER BY TABLE_TYPE,TABLE_SCHEM,TABLE_NAME"""


class TestArrayInRegprocBootstrap:
    """The catalog.scala:294-307 bootstrap query, for a scalar and an
    array type. PG array subscripts inside it are 1-based — the dialect
    rewriter maps them to try_element_at (NULL out of bounds), so the
    schema-resolution join actually resolves 'spark' instead of dying
    with INVALID_ARRAY_INDEX under ANSI mode."""

    def test_scalar_type(self, server):
        rows = _simple(server, ARRAY_IN_REGPROC_SQL.format(typ="int4"))
        assert len(rows) == 1
        assert rows[0][0] == b"f"  # int4in != array_in
        assert rows[0][1] == b"b"  # base type

    def test_array_type(self, server):
        rows = _simple(server, ARRAY_IN_REGPROC_SQL.format(typ="_int4"))
        assert len(rows) == 1
        assert rows[0][0] == b"t"  # arrays use array_in

    def test_unknown_type_returns_empty(self, server):
        rows = _simple(server, ARRAY_IN_REGPROC_SQL.format(typ="nope_t"))
        assert rows == []


class TestGetTypeInfo:
    #: PgJdbcSuite.scala:148-179 expectedTypeInfo, minus the two names
    #: pgjdbc synthesizes driver-side (serial/bigserial are not pg_type
    #: rows even in real PG)
    BASE_TYPES = {
        "bool", "char", "name", "byte", "int2", "int4", "int8", "tid",
        "float4", "float8", "varchar", "date", "timestamp", "interval",
        "numeric", "bytea", "map", "struct",
    }
    ARRAY_TYPES = {
        "_bool", "_int2", "_int4", "_int8", "_float4", "_float8",
        "_varchar", "_date", "_timestamp", "_interval", "_numeric",
    }

    def test_base_type_query(self, server):
        rows = _simple(server, GET_TYPE_INFO_SQL)
        names = {r[0].decode() for r in rows}
        missing = self.BASE_TYPES - names
        assert not missing, f"missing from getTypeInfo: {missing}"
        # the typelem=0 filter must exclude every array type
        assert not (self.ARRAY_TYPES & names)

    def test_array_types_carry_typelem(self, server):
        rows = _simple(
            server,
            "SELECT typname, typelem FROM pg_catalog.pg_type "
            "WHERE typname LIKE '\\_%' ORDER BY typname",
        )
        got = {r[0].decode(): int(r[1]) for r in rows}
        for name in self.ARRAY_TYPES:
            assert got.get(name, 0) != 0, f"{name} lacks typelem"

    def test_oids_match_wire_types(self, server):
        """The oids getTypeInfo returns must agree with the oids the
        row-description encoder advertises (protocol/pgtypes.py)."""
        from spark_sql_server_spark.protocol import pgtypes as P

        rows = _simple(server, GET_TYPE_INFO_SQL)
        catalog_oids = {r[0].decode(): int(r[1]) for r in rows}
        for t in P.ALL_PG_TYPES:
            if t.name in catalog_oids:
                assert catalog_oids[t.name] == t.oid, t.name


#: pgjdbc PgDatabaseMetaData.getColumns() — the per-table column
#: metadata query (drives ResultSetMetaData and \d-style tooling)
GET_COLUMNS_SQL = """SELECT * FROM (
  SELECT n.nspname, c.relname, a.attname, a.atttypid,
    a.attnotnull OR (t.typtype = 'd' AND t.typnotnull) AS attnotnull,
    a.atttypmod, a.attlen, t.typtypmod,
    row_number() OVER (PARTITION BY a.attrelid ORDER BY a.attnum) AS attnum,
    nullif(a.attidentity, '') as attidentity,
    pg_catalog.pg_get_expr(def.adbin, def.adrelid) AS adsrc,
    dsc.description, t.typbasetype, t.typtype
  FROM pg_catalog.pg_namespace n
  JOIN pg_catalog.pg_class c ON (c.relnamespace = n.oid)
  JOIN pg_catalog.pg_attribute a ON (a.attrelid=c.oid)
  JOIN pg_catalog.pg_type t ON (a.atttypid = t.oid)
  LEFT JOIN pg_catalog.pg_attrdef def ON (a.attrelid=def.adrelid AND a.attnum = def.adnum)
  LEFT JOIN pg_catalog.pg_description dsc ON (c.oid=dsc.objoid AND a.attnum = dsc.objsubid)
  LEFT JOIN pg_catalog.pg_class dc ON (dc.oid=dsc.classoid AND dc.relname='pg_description')
  LEFT JOIN pg_catalog.pg_namespace dn ON (dc.relnamespace=dn.oid AND dn.nspname='pg_catalog')
  WHERE c.relkind in ('r','p','v','f','m') and a.attnum > 0 AND NOT a.attisdropped
) c WHERE true AND c.relname LIKE '{table}' AND attname LIKE '%'
ORDER BY nspname, c.relname, attnum"""


class TestGetColumns:
    def test_nation_columns(self, server):
        rows = _simple(server, GET_COLUMNS_SQL.format(table="nation"))
        names = [r[2].decode() for r in rows]
        assert names == ["n_nationkey", "n_name", "n_regionkey"]
        # attnum is the driver-computed ordinal (row_number), 1-based
        assert [int(r[8]) for r in rows] == [1, 2, 3]
        # atttypid must be a real pg_type oid the wire encoder knows
        from spark_sql_server_spark.protocol import pgtypes as P

        known = {t.oid for t in P.ALL_PG_TYPES}
        assert all(int(r[3]) in known for r in rows)

    def test_unknown_table_empty(self, server):
        rows = _simple(server, GET_COLUMNS_SQL.format(table="zzz_missing"))
        assert rows == []


class TestGetTables:
    def test_unknown_table_empty(self, server):
        # PgJdbcSuite.scala:184: getTables(..., "t", TABLE) → empty
        rows = _simple(server, GET_TABLES_SQL.format(pat="t"))
        assert rows == []

    def test_registered_table_found(self, server):
        rows = _simple(server, GET_TABLES_SQL.format(pat="nation"))
        assert len(rows) == 1
        schem, name, ttype = rows[0][1], rows[0][2], rows[0][3]
        assert name == b"nation"
        assert ttype in (b"TABLE", b"TEMPORARY TABLE")

    def test_like_pattern(self, server):
        rows = _simple(server, GET_TABLES_SQL.format(pat="%ation%"))
        names = {r[2] for r in rows}
        assert b"nation" in names
