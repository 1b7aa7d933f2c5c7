"""TLS tests: SSLRequest 'S' + handshake on a TLS-enabled server, 'N'
refusal on a plain one (mirrors the reference's PgJdbcWithSslSuite
intent)."""

from __future__ import annotations

import asyncio
import ssl
import struct

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, rows_of

SSL_REQUEST = struct.pack("!ii", 8, 80877103)


@pytest.fixture(scope="module")
def tls_server(spark):
    loop = asyncio.new_event_loop()

    async def _run():
        srv = SparkPGServer(
            spark,
            port=0,
            init_session=lambda s: register_tables(s, SF_SMOKE),
            ssl_self_signed=True,
            pg_catalog=False,
        )
        await srv.start()
        return srv

    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def test_tls_handshake_and_query(tls_server):
    srv, loop = tls_server

    async def go():
        r, w = await asyncio.open_connection("127.0.0.1", srv.port)
        w.write(SSL_REQUEST)
        await w.drain()
        answer = await r.readexactly(1)
        assert answer == b"S"
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        await w.start_tls(ctx)
        # now the normal startup over the encrypted channel
        c = PgClient(r, w)
        from tests.test_protocol_e2e import _startup

        w.write(_startup({"user": "tls-user"}))
        await w.drain()
        msgs = await c.until_ready()
        assert msgs[0][0] == b"R"
        result = await c.simple("SELECT 41 + 1 AS v")
        await c.close()
        return result

    msgs = loop.run_until_complete(go())
    assert rows_of(msgs) == [[b"42"]]


def test_plain_server_refuses_ssl(tls_server):
    # a second, non-TLS server says 'N' and still serves plaintext
    srv, loop = tls_server

    async def go():
        plain = SparkPGServer(srv.spark, port=0, pg_catalog=False)
        await plain.start()
        r, w = await asyncio.open_connection("127.0.0.1", plain.port)
        w.write(SSL_REQUEST)
        await w.drain()
        answer = await r.readexactly(1)
        c = PgClient(r, w)
        from tests.test_protocol_e2e import _startup

        w.write(_startup({"user": "plain"}))
        await w.drain()
        await c.until_ready()
        result = await c.simple("SELECT 1 AS one")
        await c.close()
        await plain.stop()
        return answer, result

    answer, msgs = loop.run_until_complete(go())
    assert answer == b"N"
    assert rows_of(msgs) == [[b"1"]]
