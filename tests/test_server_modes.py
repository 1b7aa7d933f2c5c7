"""Server-level mode confs (reference SQLServerConf.scala parity):

* ``spark.sql.server.executionMode=single-session`` — every client
  shares one SparkSession, so temp views cross connections
  (SQLServerConf.scala:69-72, SparkSQLServiceManager.scala:108-111).
* ``spark.sql.server.binaryTransferMode=false`` — results are forced to
  text format even when Bind asks for binary (SQLServerConf.scala:165).
"""

from __future__ import annotations

import asyncio

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import (
    PgClient,
    _bind,
    _execute,
    _m,
    _parse,
    rows_of,
    run,
)


def _mode_server(spark, **kwargs):
    async def _run():
        srv = SparkPGServer(
            spark,
            port=0,
            init_session=lambda s: register_tables(s, SF_SMOKE),
            **kwargs,
        )
        await srv.start()
        return srv

    loop = asyncio.new_event_loop()
    srv = loop.run_until_complete(_run())
    return srv, loop


@pytest.fixture(scope="module")
def single_session_server(spark):
    srv, loop = _mode_server(spark, execution_mode="single-session")
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


@pytest.fixture(scope="module")
def text_only_server(spark):
    srv, loop = _mode_server(spark, binary_transfer=False)
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


class TestSingleSessionMode:
    def test_temp_view_crosses_connections(self, single_session_server):
        srv, loop = single_session_server

        async def go():
            a = await PgClient.connect(srv.port)
            await a.simple(
                "CREATE OR REPLACE TEMPORARY VIEW cross_conn_v AS SELECT 42 AS x"
            )
            b = await PgClient.connect(srv.port)
            msgs = await b.simple("SELECT x FROM cross_conn_v")
            await a.close()
            await b.close()
            return msgs

        msgs = run(loop, go())
        assert rows_of(msgs) == [[b"42"]]

    def test_multi_session_still_isolates(self, spark):
        srv, loop = _mode_server(spark)  # default execution mode
        try:

            async def go():
                a = await PgClient.connect(srv.port)
                await a.simple(
                    "CREATE OR REPLACE TEMPORARY VIEW iso_conn_v AS SELECT 1 AS x"
                )
                b = await PgClient.connect(srv.port)
                msgs = await b.simple("SELECT x FROM iso_conn_v")
                await a.close()
                await b.close()
                return msgs

            msgs = run(loop, go())
            assert any(t == b"E" for t, _ in msgs), "view leaked across sessions"
        finally:
            loop.run_until_complete(srv.stop())
            loop.close()

    def test_rejects_unknown_mode(self, spark):
        with pytest.raises(ValueError, match="executionMode"):
            SparkPGServer(spark, port=0, execution_mode="multi-context")


class TestNoHiveGate:
    def test_hive_errors_map_to_feature_not_supported(self):
        """Sessions built with SPARK_GRAFT_NO_HIVE=1 surface Spark's
        Hive-needed errors as SQLSTATE 0A000 (feature_not_supported)."""
        from spark_sql_server_spark.protocol.server import _sqlstate_for

        assert (
            _sqlstate_for(
                Exception(
                    "[NOT_SUPPORTED_COMMAND_WITHOUT_HIVE_SUPPORT] CREATE "
                    "Hive TABLE (AS SELECT) is not supported"
                )
            )
            == "0A000"
        )
        assert (
            _sqlstate_for(Exception("Hive support is required to CREATE ..."))
            == "0A000"
        )


class TestMonitoringViews:
    def test_pg_stat_activity_lists_sessions(self, spark):
        srv, loop = _mode_server(spark)
        try:

            async def go():
                a = await PgClient.connect(srv.port, user="alice")
                b = await PgClient.connect(srv.port, user="bob")
                msgs = await a.simple(
                    "SELECT pid, usename, state FROM pg_stat_activity ORDER BY pid"
                )
                qual = await a.simple(
                    "SELECT count(*) FROM pg_catalog.pg_stat_activity"
                )
                await a.close()
                await b.close()
                return msgs, qual

            msgs, qual = run(loop, go())
            rows = rows_of(msgs)
            assert len(rows) == 2
            assert {r[1] for r in rows} == {b"alice", b"bob"}
            # the querying session is 'active', the other 'idle'
            assert sorted(r[2] for r in rows) == [b"active", b"idle"]
            assert rows_of(qual) == [[b"2"]]
        finally:
            loop.run_until_complete(srv.stop())
            loop.close()

    def test_pg_stat_server_counters(self, spark):
        srv, loop = _mode_server(spark)
        try:

            async def go():
                c = await PgClient.connect(srv.port)
                await c.simple("SELECT 1")
                msgs = await c.simple(
                    "SELECT statements_executed, connections_opened, "
                    "active_sessions, uptime_sec FROM pg_stat_server"
                )
                await c.close()
                return msgs

            msgs = run(loop, go())
            (row,) = rows_of(msgs)
            assert int(row[0]) >= 2  # SELECT 1 + this statement
            assert int(row[1]) == 1
            assert int(row[2]) == 1
            assert int(row[3]) >= 0
        finally:
            loop.run_until_complete(srv.stop())
            loop.close()


class TestBinaryTransferMode:
    def _int4_row(self, srv, loop):
        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("s1", "SELECT CAST(7 AS INT) AS x"),
                _bind("", "s1", result_formats=[1]),  # client asks binary
                _m(b"D", b"P\x00"),
                _execute(""),
                _m(b"S"),
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        desc = next(b for t, b in msgs if t == b"T")
        datarow = next(b for t, b in msgs if t == b"D")
        # last 2 bytes of the single field descriptor = format code
        fmt = int.from_bytes(desc[-2:], "big")
        field = datarow[6:]  # skip count + length
        return fmt, field

    def test_binary_honored_by_default(self, spark):
        srv, loop = _mode_server(spark)
        try:
            fmt, field = self._int4_row(srv, loop)
            assert fmt == 1
            assert field == (7).to_bytes(4, "big")
        finally:
            loop.run_until_complete(srv.stop())
            loop.close()

    def test_text_forced_when_disabled(self, text_only_server):
        srv, loop = text_only_server
        fmt, field = self._int4_row(srv, loop)
        assert fmt == 0
        assert field == b"7"
