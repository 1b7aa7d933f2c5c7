"""SQL-level PREPARE / EXECUTE / DEALLOCATE — the statement surface psql
scripts and connection poolers use (PG PREPARE evaluates EXECUTE's
argument *expressions*, so args are spliced as SQL fragments)."""

from __future__ import annotations

import asyncio

import pytest

from spark_sql_server_spark.dialect.commands import (
    StatementClass,
    classify_statement,
    split_top_level_commas,
    substitute_params,
)
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, completes_of, rows_of


class TestClassify:
    def test_prepare(self):
        st = classify_statement(
            "PREPARE p1 (int) AS SELECT n_name FROM nation WHERE n_nationkey = $1"
        )
        assert st.cls is StatementClass.PREPARE
        assert st.cursor_name == "p1"
        assert st.copy_query.startswith("SELECT n_name")

    def test_execute_with_and_without_args(self):
        st = classify_statement("EXECUTE p1(3)")
        assert st.cls is StatementClass.EXECUTE_STMT
        assert st.cursor_name == "p1" and st.copy_query == "3"
        st = classify_statement("EXECUTE p1")
        assert st.copy_query is None

    def test_deallocate_forms(self):
        assert classify_statement("DEALLOCATE ALL").tag == "DEALLOCATE ALL"
        st = classify_statement("DEALLOCATE PREPARE p1")
        assert st.tag == "DEALLOCATE" and st.cursor_name == "p1"


class TestSubstitution:
    def test_split_args(self):
        assert split_top_level_commas("1, 'a,b', f(2, 3)") == [
            "1",
            "'a,b'",
            "f(2, 3)",
        ]

    def test_placeholders_skip_strings(self):
        out = substitute_params("SELECT '$1', $1, $2", ["10", "'x'"])
        assert out == "SELECT '$1', (10), ('x')"

    def test_missing_param_raises(self):
        with pytest.raises(ValueError):
            substitute_params("SELECT $2", ["1"])


@pytest.fixture(scope="module")
def server(spark):
    loop = asyncio.new_event_loop()

    async def _run():
        srv = SparkPGServer(
            spark, port=0, pg_catalog=False,
            init_session=lambda s: register_tables(s, SF_SMOKE),
        )
        await srv.start()
        return srv

    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def _run(server, coro_fn):
    srv, loop = server
    return loop.run_until_complete(coro_fn(srv))


class TestPrepareExecuteE2E:
    def test_prepare_execute_reexecute(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m1 = await c.simple(
                "PREPARE nat (int) AS "
                "SELECT n_name FROM nation WHERE n_nationkey = $1"
            )
            m2 = await c.simple("EXECUTE nat(3)")
            m3 = await c.simple("EXECUTE nat(1 + 1)")  # expression arg
            m4 = await c.simple("EXECUTE nat(3)")  # re-execute
            await c.close()
            return m1, m2, m3, m4

        m1, m2, m3, m4 = _run(server, go)
        assert completes_of(m1) == ["PREPARE"]
        assert rows_of(m2) == [[b"NATION_3"]]
        assert rows_of(m3) == [[b"NATION_2"]]
        assert rows_of(m4) == [[b"NATION_3"]]

    def test_string_arg_and_multiparam(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple(
                "PREPARE rng (text, int) AS SELECT n_nationkey FROM nation "
                "WHERE n_name = $1 OR n_nationkey = $2 ORDER BY 1"
            )
            m = await c.simple("EXECUTE rng('NATION_5', 7)")
            await c.close()
            return m

        m = _run(server, go)
        assert rows_of(m) == [[b"5"], [b"7"]]

    def test_duplicate_prepare_errors(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("PREPARE dup AS SELECT 1")
            m = await c.simple("PREPARE dup AS SELECT 2")
            await c.close()
            return m

        m = _run(server, go)
        assert any(t == b"E" for t, _ in m)

    def test_deallocate_named_then_execute_errors(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("PREPARE gone AS SELECT 42 AS v")
            ok = await c.simple("EXECUTE gone")
            d = await c.simple("DEALLOCATE gone")
            gone = await c.simple("EXECUTE gone")
            missing = await c.simple("DEALLOCATE never_existed")
            await c.close()
            return ok, d, gone, missing

        ok, d, gone, missing = _run(server, go)
        assert rows_of(ok) == [[b"42"]]
        assert completes_of(d) == ["DEALLOCATE"]
        assert any(t == b"E" for t, _ in gone)
        assert any(t == b"E" for t, _ in missing)

    def test_deallocate_all(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("PREPARE a1 AS SELECT 1")
            await c.simple("PREPARE a2 AS SELECT 2")
            d = await c.simple("DEALLOCATE ALL")
            g = await c.simple("EXECUTE a1")
            await c.close()
            return d, g

        d, g = _run(server, go)
        assert completes_of(d) == ["DEALLOCATE ALL"]
        assert any(t == b"E" for t, _ in g)

    def test_execute_unknown_errors(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m = await c.simple("EXECUTE no_such(1)")
            await c.close()
            return m

        m = _run(server, go)
        assert any(t == b"E" for t, _ in m)


class TestShowGuc:
    """PG `SHOW <setting>` — psql/JDBC session bootstrap statements."""

    def test_show_known_settings(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            sv = await c.simple("SHOW server_version")
            tz = await c.simple("SHOW TimeZone")
            iso = await c.simple("SHOW TRANSACTION ISOLATION LEVEL")
            await c.close()
            return sv, tz, iso

        sv, tz, iso = _run(server, go)
        assert rows_of(sv) == [[b"9.6.0"]]
        assert completes_of(sv) == ["SHOW"]
        assert rows_of(tz) == [[b"UTC"]]
        assert rows_of(iso) == [[b"read committed"]]
        # column named like the setting
        t = next(b for tname, b in iso if tname == b"T")
        assert b"transaction_isolation" in t

    def test_set_show_roundtrip(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("SET application_name TO 'myapp'")
            m = await c.simple("SHOW application_name")
            await c.close()
            return m

        m = _run(server, go)
        assert rows_of(m) == [[b"myapp"]]

    def test_show_all_three_columns(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m = await c.simple("SHOW ALL")
            await c.close()
            return m

        m = _run(server, go)
        rows = rows_of(m)
        assert len(rows) >= 10 and all(len(r) == 3 for r in rows)
        names = [r[0] for r in rows]
        assert b"server_version" in names and b"timezone" in names

    def test_show_unknown_errors(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m = await c.simple("SHOW no_such_setting_xyz")
            await c.close()
            return m

        m = _run(server, go)
        assert any(t == b"E" for t, _ in m)

    def test_spark_show_tables_passes_through(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m = await c.simple("SHOW TABLES")
            await c.close()
            return m

        m = _run(server, go)
        assert not any(t == b"E" for t, _ in m)
        assert any(b"nation" in (c or b"") for row in rows_of(m) for c in row)

    def test_show_via_extended_protocol(self, server):
        from tests.test_protocol_e2e import SYNC, _bind, _describe, _execute, _parse

        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("shw", "SHOW TimeZone"),
                _bind("", "shw", []),
                _describe("P", ""),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = _run(server, go)
        from tests.test_protocol_e2e import tags_of

        tags = tags_of(msgs)
        assert b"T" in tags  # Describe answered with a RowDescription
        assert rows_of(msgs) == [[b"UTC"]]


class TestSqlStates:
    """PG error codes for the statement-level surface (appendix A)."""

    def _err_body(self, msgs) -> bytes:
        return next(b for t, b in msgs if t == b"E")

    def test_codes(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("PREPARE sc AS SELECT 1")
            dup = await c.simple("PREPARE sc AS SELECT 2")
            missing = await c.simple("EXECUTE sc_missing")
            badcur = await c.simple("FETCH 1 FROM no_cursor")
            badguc = await c.simple("SHOW not_a_setting")
            await c.close()
            return dup, missing, badcur, badguc

        dup, missing, badcur, badguc = _run(server, go)
        assert b"C42P05\x00" in self._err_body(dup)
        assert b"C26000\x00" in self._err_body(missing)
        assert b"C34000\x00" in self._err_body(badcur)
        assert b"C42704\x00" in self._err_body(badguc)


class TestExtendedProtocolPrepare:
    """SQL-level PREPARE/EXECUTE sent through Parse/Bind/Execute."""

    def test_prepare_then_execute_extended(self, server):
        from tests.test_protocol_e2e import SYNC, _bind, _describe, _execute, _parse

        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("xp", "PREPARE xps AS SELECT n_name FROM nation "
                             "WHERE n_nationkey = $1"),
                _bind("", "xp", []),
                _execute(""),
                SYNC,
            )
            m1 = await c.until_ready()
            await c.send(
                _parse("xe", "EXECUTE xps(4)"),
                _bind("", "xe", []),
                _describe("P", ""),
                _execute(""),
                SYNC,
            )
            m2 = await c.until_ready()
            await c.close()
            return m1, m2

        m1, m2 = _run(server, go)
        assert not any(t == b"E" for t, _ in m1)
        assert rows_of(m2) == [[b"NATION_4"]]


class TestParamCountValidation:
    """PG raises 42601 'wrong number of parameters' for surplus/missing
    EXECUTE args, even when the query skips declared parameters."""

    def test_count_placeholders_quote_aware(self):
        from spark_sql_server_spark.dialect.commands import count_placeholders

        assert count_placeholders("SELECT $1, $2") == 2
        assert count_placeholders("SELECT '$9', $3") == 3
        assert count_placeholders('SELECT "$7"') == 0
        assert count_placeholders("SELECT 1") == 0

    def test_parenthesized_types_parse(self):
        st = classify_statement(
            "PREPARE pt (DECIMAL(10,2), VARCHAR(20)) AS SELECT $1, $2"
        )
        assert st.cls is StatementClass.PREPARE
        assert st.prepare_nparams == 2

    def test_wrong_arg_count_errors(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple(
                "PREPARE wc (int, int) AS "
                "SELECT n_name FROM nation WHERE n_nationkey = $1"
            )
            too_few = await c.simple("EXECUTE wc(3)")  # declared 2
            too_many = await c.simple("EXECUTE wc(3, 4, 5)")
            ok = await c.simple("EXECUTE wc(3, 99)")  # $2 unused but legal
            await c.close()
            return too_few, too_many, ok

        too_few, too_many, ok = _run(server, go)
        err1 = next(b for t, b in too_few if t == b"E")
        err2 = next(b for t, b in too_many if t == b"E")
        assert b"C42601\x00" in err1 and b"C42601\x00" in err2
        assert rows_of(ok) == [[b"NATION_3"]]

    def test_inferred_count_from_placeholders(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple(
                "PREPARE inf1 AS SELECT n_name FROM nation "
                "WHERE n_nationkey = $1"
            )
            extra = await c.simple("EXECUTE inf1(1, 2)")
            ok = await c.simple("EXECUTE inf1(5)")
            await c.close()
            return extra, ok

        extra, ok = _run(server, go)
        assert any(t == b"E" for t, _ in extra)
        assert rows_of(ok) == [[b"NATION_5"]]

    def test_decimal_type_prepare_executes(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            p = await c.simple(
                "PREPARE pdec (DECIMAL(10,2)) AS SELECT CAST($1 AS DOUBLE) AS v"
            )
            m = await c.simple("EXECUTE pdec(1.5)")
            await c.close()
            return p, m

        p, m = _run(server, go)
        assert completes_of(p) == ["PREPARE"]
        assert rows_of(m) == [[b"1.5"]]


class TestDescribeExecute:
    """Describe of a SQL-level EXECUTE resolves the prepared query and
    answers a RowDescription (Describe-first JDBC clients need it)."""

    def test_describe_portal_before_execute(self, server):
        from tests.test_protocol_e2e import (
            SYNC, _bind, _describe, _execute, _parse, tags_of,
        )

        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple(
                "PREPARE dsc AS SELECT n_name FROM nation WHERE n_nationkey = 6"
            )
            await c.send(
                _parse("dx", "EXECUTE dsc"),
                _bind("", "dx", []),
                _describe("P", ""),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = _run(server, go)
        from tests.test_protocol_e2e import tags_of

        tags = tags_of(msgs)
        assert b"T" in tags  # RowDescription, not NoData
        rowdesc = next(b for t, b in msgs if t == b"T")
        assert b"n_name" in rowdesc
        assert rows_of(msgs) == [[b"NATION_6"]]

    def test_reprepare_invalidates_cached_describe(self, server):
        """DEALLOCATE + re-PREPARE between Describe and Execute must not
        stream rows from the stale pre-DEALLOCATE resolution (r5 ADVICE:
        ps.df was cached by statement identity, not by resolved SQL)."""
        from tests.test_protocol_e2e import (
            SYNC, _bind, _describe, _execute, _parse,
        )

        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple(
                "PREPARE rp AS SELECT n_name FROM nation WHERE n_nationkey = 1"
            )
            # Describe('S') caches the resolved DataFrame on the parsed stmt
            await c.send(_parse("rpx", "EXECUTE rp"), _describe("S", "rpx"), SYNC)
            await c.until_ready()
            await c.simple("DEALLOCATE rp")
            await c.simple(
                "PREPARE rp AS SELECT n_name FROM nation WHERE n_nationkey = 3"
            )
            # re-Bind + Execute the SAME parsed statement
            await c.send(
                _bind("", "rpx", []), _describe("P", ""), _execute(""), SYNC
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = _run(server, go)
        assert rows_of(msgs) == [[b"NATION_3"]]  # not the stale NATION_1

    def test_describe_statement_kind(self, server):
        from tests.test_protocol_e2e import SYNC, _describe, _parse, tags_of

        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple(
                "PREPARE dss AS SELECT n_nationkey, n_name FROM nation LIMIT 1"
            )
            await c.send(
                _parse("ds2", "EXECUTE dss"),
                _describe("S", "ds2"),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = _run(server, go)
        from tests.test_protocol_e2e import tags_of

        tags = tags_of(msgs)
        assert b"T" in tags
        rowdesc = next(b for t, b in msgs if t == b"T")
        assert b"n_nationkey" in rowdesc and b"n_name" in rowdesc


class TestShowAllOverlay:
    """SET x then SHOW ALL must report the session value, like SHOW x."""

    def test_set_reflected_in_show_all(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("SET search_path TO 'myschema'")
            single = await c.simple("SHOW search_path")
            alls = await c.simple("SHOW ALL")
            await c.close()
            return single, alls

        single, alls = _run(server, go)
        assert rows_of(single) == [[b"myschema"]]
        row = next(r for r in rows_of(alls) if r[0] == b"search_path")
        assert row[1] == b"myschema"
