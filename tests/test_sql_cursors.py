"""SQL-level cursor tests (DECLARE/FETCH/CLOSE) — the statement surface
psycopg2 named cursors use. Extension over the reference (it only has
protocol-level portals)."""

from __future__ import annotations

import asyncio

import pytest

from spark_sql_server_spark.dialect.commands import StatementClass, classify_statement
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, completes_of, rows_of, tags_of


class TestClassify:
    def test_declare(self):
        st = classify_statement(
            'DECLARE "my_cur" CURSOR FOR SELECT * FROM nation'
        )
        assert st.cls is StatementClass.DECLARE_CURSOR
        assert st.cursor_name == "my_cur"
        assert st.copy_query == "SELECT * FROM nation"

    def test_declare_with_options(self):
        st = classify_statement(
            "DECLARE c NO SCROLL CURSOR WITHOUT HOLD FOR SELECT 1"
        )
        assert st.cls is StatementClass.DECLARE_CURSOR
        assert st.copy_query == "SELECT 1"

    def test_fetch_variants(self):
        assert classify_statement("FETCH 10 FROM c").fetch_count == 10
        assert classify_statement("FETCH FORWARD 5 FROM c").fetch_count == 5
        assert classify_statement("FETCH ALL FROM c").fetch_count is None
        assert classify_statement("FETCH c").fetch_count is None
        assert classify_statement("FETCH NEXT 1 IN c").cursor_name == "c"

    def test_close(self):
        assert classify_statement("CLOSE c").cls is StatementClass.CLOSE_CURSOR
        assert classify_statement("CLOSE ALL").cursor_name == "ALL"


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


class TestSqlCursors:
    def test_declare_fetch_close(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            d = await c.simple(
                "DECLARE cur1 CURSOR FOR "
                "SELECT n_nationkey FROM nation ORDER BY n_nationkey"
            )
            f1 = await c.simple("FETCH 10 FROM cur1")
            f2 = await c.simple("FETCH 10 FROM cur1")
            f3 = await c.simple("FETCH ALL FROM cur1")
            cl = await c.simple("CLOSE cur1")
            await c.close()
            return d, f1, f2, f3, cl

        d, f1, f2, f3, cl = loop.run_until_complete(go())
        assert completes_of(d) == ["DECLARE CURSOR"]
        assert len(rows_of(f1)) == 10 and completes_of(f1) == ["FETCH 10"]
        assert rows_of(f1)[0] == [b"0"]
        assert len(rows_of(f2)) == 10
        assert rows_of(f2)[0] == [b"10"]  # continues where f1 stopped
        assert len(rows_of(f3)) == 5 and completes_of(f3) == ["FETCH 5"]
        assert completes_of(cl) == ["CLOSE CURSOR"]

    def test_fetch_exhausted_returns_zero(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.simple("DECLARE cur2 CURSOR FOR SELECT 1 AS x")
            await c.simple("FETCH ALL FROM cur2")
            empty = await c.simple("FETCH 5 FROM cur2")
            await c.close()
            return empty

        empty = loop.run_until_complete(go())
        assert rows_of(empty) == []
        assert completes_of(empty) == ["FETCH 0"]

    def test_unknown_cursor_errors(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("FETCH 1 FROM nonexistent")
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert b"E" in tags_of(msgs)

    def test_begin_declare_fetch_in_one_message(self, server):
        # what psycopg2 named cursors actually send
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "BEGIN; DECLARE nc CURSOR FOR SELECT r_name FROM region "
                "ORDER BY r_name; FETCH 2 FROM nc"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert completes_of(msgs) == ["BEGIN", "DECLARE CURSOR", "FETCH 2"]
        assert len(rows_of(msgs)) == 2


class TestFetchSizeIncrementalMatrix:
    """Twin of the reference's fetchSize × incrementalCollect cursor
    matrix (PgJdbcSuite.scala:1144-1200): a portal walked with repeated
    Execute(max_rows) must deliver the exact row sequence across
    PortalSuspended boundaries under every combination of fetch size
    and collect mode."""

    @pytest.mark.parametrize("incremental", [True, False])
    @pytest.mark.parametrize("fetch_size", [1, 2, 1000])
    def test_exact_row_walk(self, spark, incremental, fetch_size):
        from tests.test_protocol_e2e import SYNC, _bind, _execute, _parse

        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(
                spark, port=0, pg_catalog=False,
                incremental_collect=incremental,
                init_session=lambda s: register_tables(s, SF_SMOKE),
            )
            await srv.start()
            try:
                c = await PgClient.connect(srv.port)
                await c.send(
                    _parse("w", "SELECT id FROM range(6) ORDER BY id"),
                    _bind("", "w", []),
                    SYNC,
                )
                await c.until_ready()
                rows: list[bytes] = []
                suspensions = 0
                for _ in range(20):  # 6 rows / fetch_size bounded
                    await c.send(_execute("", max_rows=fetch_size), SYNC)
                    msgs = await c.until_ready()
                    rows += [r[0] for r in rows_of(msgs)]
                    if any(t == b"s" for t, _ in msgs):
                        suspensions += 1
                        continue
                    break
                await c.close()
                return rows, suspensions
            finally:
                await srv.stop()

        rows, suspensions = loop.run_until_complete(go())
        loop.run_until_complete(asyncio.sleep(0.05))  # drain close callbacks
        loop.close()
        assert rows == [str(i).encode() for i in range(6)]
        if fetch_size == 1000:
            assert suspensions == 0  # one Execute drains the portal
        else:
            # 6 rows at fetch_size per round: every full batch suspends
            assert suspensions == 6 // fetch_size
