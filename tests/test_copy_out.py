"""COPY ... TO STDOUT extension tests (reference gap: it rejects COPY)."""

from __future__ import annotations

import asyncio
import struct

import pytest

from spark_sql_server_spark.dialect.commands import StatementClass, classify_statement
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, _q


class TestClassify:
    def test_copy_query_to_stdout(self):
        st = classify_statement("COPY (SELECT 1 AS a) TO STDOUT")
        assert st.cls is StatementClass.COPY_OUT
        assert st.copy_query == "SELECT 1 AS a"
        assert st.copy_format == "text"

    def test_copy_table_csv_header(self):
        st = classify_statement("COPY nation TO STDOUT WITH (FORMAT CSV, HEADER)")
        assert st.cls is StatementClass.COPY_OUT
        assert st.copy_query == "SELECT * FROM nation"
        assert st.copy_format == "csv"
        assert st.copy_header

    def test_copy_from_not_matched(self):
        st = classify_statement("COPY t FROM STDIN")
        assert st.cls is StatementClass.QUERY  # falls through → Spark errors


@pytest.fixture(scope="module")
def server(spark):
    loop = asyncio.new_event_loop()

    async def _run():
        srv = SparkPGServer(
            spark, port=0, init_session=lambda s: register_tables(s, SF_SMOKE)
        )
        await srv.start()
        return srv

    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def copy_payload(msgs) -> bytes:
    return b"".join(b for t, b in msgs if t == b"d")


class TestCopyOut:
    def test_text_format(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "COPY (SELECT n_nationkey, n_name FROM nation "
                "WHERE n_nationkey < 3 ORDER BY n_nationkey) TO STDOUT"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        tags = [t for t, _ in msgs]
        assert tags[0] == b"H" and b"c" in tags
        lines = copy_payload(msgs).decode().splitlines()
        assert lines == ["0\tNATION_0", "1\tNATION_1", "2\tNATION_2"]
        completes = [b.rstrip(b"\0").decode() for t, b in msgs if t == b"C"]
        assert completes == ["COPY 3"]

    def test_csv_with_header(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "COPY (SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey) "
                "TO STDOUT WITH (FORMAT CSV, HEADER)"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        lines = copy_payload(msgs).decode().splitlines()
        assert lines[0] == "r_regionkey,r_name"
        assert len(lines) == 6

    def test_null_rendering(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            text = await c.simple(
                "COPY (SELECT CAST(NULL AS INT) AS a, 1 AS b) TO STDOUT"
            )
            csv = await c.simple(
                "COPY (SELECT CAST(NULL AS INT) AS a, 1 AS b) TO STDOUT WITH (FORMAT CSV)"
            )
            await c.close()
            return text, csv

        text, csv = loop.run_until_complete(go())
        assert copy_payload(text).decode() == "\\N\t1\n"
        assert copy_payload(csv).decode() == ",1\n"

    def test_escaping(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "COPY (SELECT 'a\tb' AS t, 'x,\"y\"' AS c) TO STDOUT WITH (FORMAT CSV)"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert copy_payload(msgs).decode() == 'a\tb,"x,""y"""\n'
