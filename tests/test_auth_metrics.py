"""Password auth + server metrics tests."""

from __future__ import annotations

import asyncio
import struct

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from tests.test_protocol_e2e import PgClient, _q, _startup, rows_of


@pytest.fixture(scope="module")
def auth_server(spark):
    loop = asyncio.new_event_loop()

    async def _run():
        srv = SparkPGServer(
            spark,
            port=0,
            pg_catalog=False,
            auth="password",
            password_check=lambda user, pw: (user, pw) == ("alice", "secret"),
        )
        await srv.start()
        return srv

    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def _password_msg(pw: str) -> bytes:
    body = pw.encode() + b"\0"
    return b"p" + struct.pack("!i", len(body) + 4) + body


async def _connect_with_password(port: int, user: str, pw: str):
    r, w = await asyncio.open_connection("127.0.0.1", port)
    w.write(_startup({"user": user}))
    await w.drain()
    hdr = await r.readexactly(5)
    (ln,) = struct.unpack("!i", hdr[1:])
    body = await r.readexactly(ln - 4)
    assert hdr[:1] == b"R" and struct.unpack("!i", body[:4])[0] == 3  # cleartext
    w.write(_password_msg(pw))
    await w.drain()
    return r, w


class TestPasswordAuth:
    def test_correct_password(self, auth_server):
        srv, loop = auth_server

        async def go():
            r, w = await _connect_with_password(srv.port, "alice", "secret")
            c = PgClient(r, w)
            msgs = await c.until_ready()
            assert msgs[0][0] == b"R"  # AuthenticationOk
            result = await c.simple("SELECT 5 AS v")
            await c.close()
            return result

        msgs = loop.run_until_complete(go())
        assert rows_of(msgs) == [[b"5"]]

    def test_wrong_password_rejected(self, auth_server):
        srv, loop = auth_server

        async def go():
            r, w = await _connect_with_password(srv.port, "alice", "nope")
            hdr = await r.readexactly(5)
            (ln,) = struct.unpack("!i", hdr[1:])
            body = await r.readexactly(ln - 4)
            w.close()
            return hdr[:1], body

        tag, body = loop.run_until_complete(go())
        assert tag == b"E"
        assert b"28P01" in body

    def test_wrong_user_rejected(self, auth_server):
        srv, loop = auth_server

        async def go():
            r, w = await _connect_with_password(srv.port, "mallory", "secret")
            hdr = await r.readexactly(5)
            w.close()
            return hdr[:1]

        assert loop.run_until_complete(go()) == b"E"


class TestSchedulerPool:
    def test_pool_applied_in_worker_thread(self, spark):
        """SET spark.sql.server.pool must reach the JVM thread that
        actually runs the job (local properties are per-thread)."""
        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(spark, port=0, pg_catalog=False)
            await srv.start()
            c = await PgClient.connect(srv.port)
            await c.simple("SET spark.sql.server.pool = analytics")
            state = next(iter(srv._sessions.values()))
            assert state.scheduler_pool == "analytics"
            # run a query; the pool property is set in the same thread
            # as the action (asserted indirectly: query succeeds and the
            # session keeps the pool)
            msgs = await c.simple("SELECT 1 AS x")
            await c.close()
            await srv.stop()
            return msgs, state.scheduler_pool

        msgs, pool = loop.run_until_complete(go())
        loop.close()
        assert rows_of(msgs) == [[b"1"]]
        assert pool == "analytics"


class TestDateParamCoercion:
    def test_unspecified_text_param_coerces(self, spark):
        """PG JDBC sends Date/Timestamp params as Oid.UNSPECIFIED text;
        the reference errors (PgJdbcSuite.scala:744-777) — we pass the
        string through and let Spark coerce (documented extension)."""
        from tests.test_protocol_e2e import SYNC, _bind, _execute, _parse

        loop = asyncio.new_event_loop()

        async def go():
            from spark_sql_server_spark.session import register_tables
            from tests.conftest import SF_SMOKE

            srv = SparkPGServer(
                spark, port=0, pg_catalog=False,
                init_session=lambda s: register_tables(s, SF_SMOKE),
            )
            await srv.start()
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse(
                    "dt",
                    "SELECT count(*) AS n FROM orders WHERE o_orderdate < $1",
                    [0],  # UNSPECIFIED oid
                ),
                _bind("", "dt", [b"1996-01-01 00:00:00"]),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            await srv.stop()
            return msgs

        msgs = loop.run_until_complete(go())
        loop.close()
        rows = rows_of(msgs)
        assert len(rows) == 1
        assert int(rows[0][0]) > 0


class TestSqlStates:
    @pytest.mark.parametrize(
        "sql,code",
        [
            ("SELEC nope", b"42601"),
            ("SELECT * FROM table_that_is_not_there", b"42P01"),
            ("SELECT col_that_is_not_there FROM region", b"42703"),
            ("COMMIT", b"0A000"),
        ],
    )
    def test_error_codes(self, spark, sql, code):
        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(spark, port=0, pg_catalog=False)
            await srv.start()
            from spark_sql_server_spark.session import register_tables
            from tests.conftest import SF_SMOKE

            register_tables(srv.spark, SF_SMOKE)
            c = await PgClient.connect(srv.port)
            # register views in this session too
            await c.simple(
                "CREATE OR REPLACE TEMPORARY VIEW region AS SELECT 1 AS r_regionkey"
            )
            msgs = await c.simple(sql)
            await c.close()
            await srv.stop()
            return msgs

        msgs = loop.run_until_complete(go())
        loop.close()
        err = next(b for t, b in msgs if t == b"E")
        assert b"C" + code + b"\x00" in err, err[:200]


async def _http_get(port: int, path: str) -> tuple[int, bytes]:
    r, w = await asyncio.open_connection("127.0.0.1", port)
    w.write(f"GET {path} HTTP/1.1\r\nHost: x\r\n\r\n".encode())
    await w.drain()
    raw = await r.read(65536)
    w.close()
    try:
        await w.wait_closed()
    except ConnectionError:
        pass
    head, _, body = raw.partition(b"\r\n\r\n")
    status = int(head.split(b" ", 2)[1])
    return status, body


class TestHttpMetrics:
    def test_endpoints(self, spark):
        """/metrics (Prometheus), /metrics.json, /healthz over a live
        server — HTTP twin of the reference's listener + UI tab."""
        import json

        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(spark, port=0, pg_catalog=False, metrics_port=0)
            await srv.start()
            c = await PgClient.connect(srv.port)
            await c.simple("SELECT 1 AS a")
            mport = srv.metrics_server.port
            health = await _http_get(mport, "/healthz")
            prom = await _http_get(mport, "/metrics")
            js = await _http_get(mport, "/metrics.json")
            missing = await _http_get(mport, "/nope")
            await c.close()
            await srv.stop()
            return health, prom, js, missing

        health, prom, js, missing = loop.run_until_complete(go())
        loop.close()
        assert health[0] == 200
        assert prom[0] == 200
        assert b"pg_server_statements_executed 1" in prom[1]
        assert b"pg_server_connections_opened 1" in prom[1]
        assert b"# TYPE pg_server_active_sessions gauge" in prom[1]
        assert js[0] == 200
        doc = json.loads(js[1])
        assert doc["server"]["statements_executed"] == 1
        assert doc["sessions"][0]["query"].startswith("SELECT 1")
        # recent-statements ring (the reference UI's statement table)
        assert doc["statements"][-1]["query"].startswith("SELECT 1")
        assert doc["statements"][-1]["state"] == "finished"
        assert doc["statements"][-1]["duration_ms"] >= 0
        assert missing[0] == 404

    def test_status_page(self, spark):
        """GET / renders the HTML status page — server counters, live
        sessions, recent statements (the reference's SQLServerPage
        tables, ui/SQLServerPage.scala)."""
        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(spark, port=0, pg_catalog=False, metrics_port=0)
            await srv.start()
            c = await PgClient.connect(srv.port)
            await c.simple("SELECT 42 AS probe_status_page")
            try:
                await c.simple("SELECT definitely_not_a_column")
            except Exception:
                pass
            page = await _http_get(srv.metrics_server.port, "/")
            alias = await _http_get(srv.metrics_server.port, "/status")
            await c.close()
            await srv.stop()
            return page, alias

        page, alias = loop.run_until_complete(go())
        loop.close()
        assert page[0] == 200 and alias[0] == 200
        body = page[1].decode()
        assert "<title>spark-sql-server status</title>" in body
        assert "statements_executed" in body
        assert "probe_status_page" in body          # statement table
        assert ">failed<" in body                    # error state shown
        assert "definitely_not_a_column" in body

    def test_disabled_by_default(self, spark):
        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(spark, port=0, pg_catalog=False)
            await srv.start()
            ms = srv.metrics_server
            await srv.stop()
            return ms

        assert loop.run_until_complete(go()) is None
        loop.close()


class TestMetrics:
    def test_counters_move(self, spark):
        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(spark, port=0, pg_catalog=False)
            await srv.start()
            c = await PgClient.connect(srv.port)
            await c.simple("SELECT 1 AS a")
            await c.simple("SELECT nope FROM nowhere")
            await c.close()
            snap = srv.metrics.snapshot()
            await srv.stop()
            return snap

        snap = loop.run_until_complete(go())
        loop.close()
        assert snap["connections_opened"] == 1
        assert snap["statements_executed"] == 2
        assert snap["rows_sent"] == 1
        assert snap["errors"] == 1
