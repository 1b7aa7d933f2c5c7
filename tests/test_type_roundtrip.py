"""Wire round-trips of the full type surface — the e2e analogue of the
reference's PgJdbcSuite type tests (10 primitives, arrays, binary,
map/struct, NULL)."""

from __future__ import annotations

import asyncio
import struct

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from tests.test_protocol_e2e import (
    PgClient,
    _bind,
    _execute,
    _parse,
    SYNC,
    rows_of,
)


@pytest.fixture(scope="module")
def server(spark):
    loop = asyncio.new_event_loop()

    async def _run():
        srv = SparkPGServer(spark, port=0, pg_catalog=False)
        await srv.start()
        return srv

    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def one_row(server, sql: str):
    srv, loop = server

    async def go():
        c = await PgClient.connect(srv.port)
        msgs = await c.simple(sql)
        await c.close()
        return msgs

    msgs = loop.run_until_complete(go())
    assert not any(t == b"E" for t, _ in msgs), msgs
    rows = rows_of(msgs)
    assert len(rows) == 1
    return rows[0]


class TestTextRoundTrips:
    def test_primitives(self, server):
        row = one_row(
            server,
            "SELECT true AS b, CAST(1 AS TINYINT) AS i1, CAST(2 AS SMALLINT) AS i2, "
            "3 AS i4, CAST(4 AS BIGINT) AS i8, CAST(1.5 AS FLOAT) AS f4, "
            "CAST(2.25 AS DOUBLE) AS f8, CAST(3.14 AS DECIMAL(10,2)) AS num, "
            "'text' AS s",
        )
        assert row == [b"t", b"1", b"2", b"3", b"4", b"1.5", b"2.25", b"3.14", b"text"]

    def test_null(self, server):
        row = one_row(server, "SELECT CAST(NULL AS INT) AS a, 'x' AS b")
        assert row == [None, b"x"]

    def test_date_timestamp(self, server):
        row = one_row(
            server,
            "SELECT DATE '2020-06-01' AS d, TIMESTAMP '2020-06-01 12:30:45.5' AS ts",
        )
        assert row[0] == b"2020-06-01"
        assert row[1].startswith(b"2020-06-01 12:30:45.5")

    def test_arrays_pg_braces(self, server):
        # array text form uses {} (reference converters.scala:370-388)
        row = one_row(
            server,
            "SELECT array(1, 2, 3) AS ia, array('a', 'b') AS sa, "
            "array(1.5, 2.5) AS da",
        )
        assert row[0] == b"{1,2,3}"
        assert row[1] == b'{"a","b"}'
        assert row[2] == b"{1.5,2.5}"

    def test_map_struct_json(self, server):
        row = one_row(
            server,
            "SELECT map('k', 1) AS m, named_struct('a', 1, 'b', 'x') AS st",
        )
        assert row[0] == b'{"k":1}'
        assert row[1] == b'{"a":1,"b":"x"}'

    def test_binary_hex(self, server):
        row = one_row(server, "SELECT CAST('AB' AS BINARY) AS blob")
        assert row[0] == b"\\x4142"

    def test_interval_pg_format(self, server):
        row = one_row(server, "SELECT INTERVAL '3' DAY AS iv")
        assert row[0] == b"3 days"
        row = one_row(server, "SELECT INTERVAL '1 02:03:04' DAY TO SECOND AS iv")
        assert row[0] == b"1 day 02:03:04"
        row = one_row(server, "SELECT INTERVAL '90' MINUTE AS iv")
        assert row[0] == b"01:30:00"


class TestBinaryRoundTrips:
    @pytest.mark.parametrize(
        "sql,expected",
        [
            ("SELECT CAST(7 AS INT) AS v", struct.pack("!i", 7)),
            ("SELECT CAST(-9 AS BIGINT) AS v", struct.pack("!q", -9)),
            ("SELECT CAST(1.5 AS DOUBLE) AS v", struct.pack("!d", 1.5)),
            ("SELECT CAST(2.5 AS FLOAT) AS v", struct.pack("!f", 2.5)),
            # PG epoch encodings (converters.scala:255-327)
            ("SELECT DATE '2000-01-02' AS v", struct.pack("!i", 1)),
            (
                "SELECT TIMESTAMP '2000-01-01 00:00:01' AS v",
                struct.pack("!q", 1_000_000),
            ),
        ],
    )
    def test_binary_formats(self, server, sql, expected):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("tb", sql),
                _bind("", "tb", [], [1]),  # request binary results
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert rows_of(msgs) == [[expected]]

    def test_text_fallback_for_non_binary_types(self, server):
        # decimal/string have no binary form → served as text even when
        # the client asks binary (reference behavior)
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("tf", "SELECT CAST(3.14 AS DECIMAL(10,2)) AS n, 'x' AS s"),
                _bind("", "tf", [], [1]),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert rows_of(msgs) == [[b"3.14", b"x"]]
