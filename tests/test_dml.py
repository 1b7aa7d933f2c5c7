"""UPDATE / DELETE emulation tests (r11 VERDICT task 3).

Unit coverage of the parser/SQL builders in ``dialect/dml.py`` plus
socket e2e: temp-view and managed-table mutation with true rowcount
tags, the 0A000 feature-gate for every unsupported shape, boot-view
protection, and the extended-protocol ($n-parameterized) path pgbench
-M extended/prepared uses.
"""

from __future__ import annotations

import asyncio

import pytest

from spark_sql_server_spark.dialect.dml import (
    UnsupportedDml,
    build_count_sql,
    build_rewrite_sql,
    parse_dml,
)
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import (
    SYNC,
    PgClient,
    _bind,
    _execute,
    _parse,
    completes_of,
    rows_of,
    run,
)


class TestParseDml:
    def test_update_basic(self):
        s = parse_dml("UPDATE t SET a = a + 1 WHERE b = 2")
        assert (s.kind, s.table, s.assignments, s.where) == (
            "UPDATE", "t", [("a", "a + 1")], "b = 2"
        )

    def test_update_multi_assign_no_where(self):
        s = parse_dml("UPDATE t SET a = 1, b = b * 2")
        assert s.assignments == [("a", "1"), ("b", "b * 2")]
        assert s.where is None

    def test_update_qualified_target(self):
        assert parse_dml("UPDATE public.t SET a = 1").table == "t"
        assert parse_dml("UPDATE spark.t SET a = 1").table == "t"

    def test_update_alias_preserved(self):
        s = parse_dml("UPDATE t AS x SET a = 1 WHERE x.b = 2")
        assert s.alias == "x"
        assert "AS `x`" in build_count_sql(s)

    def test_delete_basic(self):
        s = parse_dml("DELETE FROM t WHERE x > 10")
        assert (s.kind, s.table, s.where) == ("DELETE", "t", "x > 10")

    def test_delete_only_qualifier(self):
        assert parse_dml("DELETE FROM ONLY t").table == "t"

    def test_subquery_comma_in_where_survives(self):
        s = parse_dml(
            "UPDATE t SET a = 1 WHERE a IN (SELECT y FROM u WHERE z = ',')"
        )
        assert "SELECT y FROM u" in s.where

    @pytest.mark.parametrize(
        "sql",
        [
            "UPDATE t SET a = 1 FROM u WHERE t.id = u.id",
            "DELETE FROM t USING u WHERE t.id = u.id",
            "UPDATE t SET a = 1 RETURNING a",
            "DELETE FROM t WHERE x = 1 RETURNING *",
            "UPDATE t SET (a, b) = (1, 2)",
            "UPDATE otherdb.t SET a = 1",
            "UPDATE t SET a = DEFAULT",
            "DELETE FROM t WHERE CURRENT OF c",
            "UPDATE t SET a = 1, a = 2",
        ],
    )
    def test_unsupported_shapes_raise_0a000(self, sql):
        with pytest.raises(UnsupportedDml) as ei:
            spec = parse_dml(sql)
            # double-assignment is only caught at build time
            build_rewrite_sql(spec, [])
        assert ei.value.sqlstate == "0A000"

    def test_build_update_casts_to_column_type(self):
        from collections import namedtuple

        class DT:
            def __init__(self, t):
                self.t = t

            def simpleString(self):
                return self.t

        F = namedtuple("F", "name dataType")
        spec = parse_dml("UPDATE t SET a = a + 1 WHERE b = 2")
        out = build_rewrite_sql(
            spec, [F("a", DT("int")), F("b", DT("bigint"))]
        )
        assert "CAST((a + 1) AS int)" in out
        assert "`b`" in out and "CASE WHEN coalesce((b = 2), false)" in out

    def test_build_delete_keeps_null_where_rows(self):
        spec = parse_dml("DELETE FROM t WHERE x > 10")
        out = build_rewrite_sql(spec, [])
        # PG keeps rows whose WHERE evaluates to NULL
        assert "NOT coalesce((x > 10), false)" in out


@pytest.fixture(scope="module")
def server(spark):
    async def _run():
        srv = SparkPGServer(
            spark,
            port=0,
            init_session=lambda s: register_tables(s, SF_SMOKE),
        )
        await srv.start()
        return srv

    loop = asyncio.new_event_loop()
    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def _err_fields(msgs) -> dict[bytes, bytes]:
    for tag, body in msgs:
        if tag == b"E":
            out = {}
            for part in body.split(b"\x00"):
                if part:
                    out[part[:1]] = part[1:]
            return out
    return {}


class TestDmlTempView:
    def test_update_delete_round_trip(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple(
                    "CREATE OR REPLACE TEMPORARY VIEW dml_v AS "
                    "SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'c') t(a, b)"
                )
                up = await c.simple("UPDATE dml_v SET b = 'xx' WHERE a >= 2")
                sel1 = await c.simple("SELECT a, b FROM dml_v ORDER BY a")
                de = await c.simple("DELETE FROM dml_v WHERE a = 1")
                sel2 = await c.simple("SELECT a, b FROM dml_v ORDER BY a")
                return up, sel1, de, sel2
            finally:
                await c.simple("DROP VIEW IF EXISTS dml_v")
                await c.close()

        up, sel1, de, sel2 = run(loop, go())
        assert completes_of(up) == ["UPDATE 2"]
        assert rows_of(sel1) == [
            [b"1", b"a"], [b"2", b"xx"], [b"3", b"xx"]
        ]
        assert completes_of(de) == ["DELETE 1"]
        assert rows_of(sel2) == [[b"2", b"xx"], [b"3", b"xx"]]

    def test_update_no_where_touches_all(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple(
                    "CREATE OR REPLACE TEMPORARY VIEW dml_all AS "
                    "SELECT * FROM VALUES (1), (2), (3) t(a)"
                )
                up = await c.simple("UPDATE dml_all SET a = 0")
                de = await c.simple("DELETE FROM dml_all")
                sel = await c.simple("SELECT count(*) AS n FROM dml_all")
                return up, de, sel
            finally:
                await c.simple("DROP VIEW IF EXISTS dml_all")
                await c.close()

        up, de, sel = run(loop, go())
        assert completes_of(up) == ["UPDATE 3"]
        assert completes_of(de) == ["DELETE 3"]
        assert rows_of(sel) == [[b"0"]]

    def test_null_where_rows_survive_delete(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple(
                    "CREATE OR REPLACE TEMPORARY VIEW dml_nw AS SELECT * "
                    "FROM VALUES (1), (CAST(NULL AS INT)), (3) t(a)"
                )
                de = await c.simple("DELETE FROM dml_nw WHERE a > 2")
                sel = await c.simple("SELECT count(*) AS n FROM dml_nw")
                return de, sel
            finally:
                await c.simple("DROP VIEW IF EXISTS dml_nw")
                await c.close()

        de, sel = run(loop, go())
        # only a=3 matched; the NULL row's WHERE is NULL → kept
        assert completes_of(de) == ["DELETE 1"]
        assert rows_of(sel) == [[b"2"]]


class TestDmlManagedTable:
    def test_update_delete_managed(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple("DROP TABLE IF EXISTS dml_t")
                await c.simple("CREATE TABLE dml_t (a int, b text)")
                await c.simple(
                    "INSERT INTO dml_t VALUES (1, 'a'), (2, 'b'), (3, 'c')"
                )
                up = await c.simple(
                    "UPDATE dml_t SET b = 'z' WHERE a % 2 = 1"
                )
                sel1 = await c.simple("SELECT a, b FROM dml_t ORDER BY a")
                de = await c.simple("DELETE FROM dml_t WHERE b = 'z'")
                sel2 = await c.simple("SELECT a, b FROM dml_t ORDER BY a")
                return up, sel1, de, sel2
            finally:
                await c.simple("DROP TABLE IF EXISTS dml_t")
                await c.close()

        up, sel1, de, sel2 = run(loop, go())
        assert completes_of(up) == ["UPDATE 2"]
        assert rows_of(sel1) == [
            [b"1", b"z"], [b"2", b"b"], [b"3", b"z"]
        ]
        assert completes_of(de) == ["DELETE 2"]
        assert rows_of(sel2) == [[b"2", b"b"]]


class TestDmlFeatureGate:
    def test_boot_view_protected(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "UPDATE lineitem SET l_quantity = 0 WHERE l_orderkey = 1"
            )
            await c.close()
            return msgs

        fields = _err_fields(run(loop, go()))
        assert fields.get(b"C") == b"0A000"
        assert b"immutable" in fields.get(b"M", b"")

    def test_update_from_is_0a000_not_stack_trace(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "UPDATE x SET a = 1 FROM y WHERE x.id = y.id"
            )
            await c.close()
            return msgs

        fields = _err_fields(run(loop, go()))
        assert fields.get(b"C") == b"0A000"
        assert b"not supported" in fields.get(b"M", b"")

    def test_missing_relation_is_42p01(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("UPDATE no_such_rel SET a = 1")
            await c.close()
            return msgs

        assert _err_fields(run(loop, go())).get(b"C") == b"42P01"


class TestDmlExtendedProtocol:
    def test_parameterized_update(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple(
                    "CREATE OR REPLACE TEMPORARY VIEW dml_x AS "
                    "SELECT * FROM VALUES (1, 10), (2, 20), (3, 30) t(id, v)"
                )
                # pgbench -M extended shape: UPDATE … SET v = v + $1
                # WHERE id = $2
                await c.send(
                    _parse("u1", "UPDATE dml_x SET v = v + $1 WHERE id = $2"),
                    _bind("", "u1", [b"5", b"2"]),
                    _execute(""),
                    SYNC,
                )
                up = await c.until_ready()
                sel = await c.simple("SELECT v FROM dml_x ORDER BY id")
                return up, sel
            finally:
                await c.simple("DROP VIEW IF EXISTS dml_x")
                await c.close()

        up, sel = run(loop, go())
        assert completes_of(up) == ["UPDATE 1"]
        assert rows_of(sel) == [[b"10"], [b"25"], [b"30"]]
