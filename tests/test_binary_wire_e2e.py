"""Binary-mode extended-protocol round-trips over a live socket.

The reference's largest e2e surface is the pgjdbc suite
(``PgJdbcSuite.scala:108-1254``), which exercises binary result
formats and binary parameters type by type; no pgjdbc jar exists in
this container, so this module is its raw-socket twin: Parse/Bind with
binary result-format codes against every binary-capable type
(``converters.scala:107-461`` is the byte-layout spec), asserting BYTE
equality between what arrives on the wire and the
``protocol/encoders.py`` golden vectors for the same Python values —
plus the binary-parameter receive direction and the downgrade rules a
text-mode client like psql can never observe.
"""

from __future__ import annotations

import asyncio
import math
import struct
from datetime import date, datetime

import pytest

from pyspark.sql import types as T

from spark_sql_server_spark.protocol.encoders import binary_encoder
from spark_sql_server_spark.protocol import pgtypes as P
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import (
    SYNC,
    PgClient,
    _cstr,
    _describe,
    _execute,
    _m,
    _parse,
    rows_of,
    run,
    tags_of,
)


def _bind_fmt(
    portal: str,
    stmt: str,
    params: list[bytes | None] = (),
    param_formats: list[int] = (),
    result_formats: list[int] = (),
) -> bytes:
    """Bind with explicit parameter format codes (the shared helper in
    test_protocol_e2e hardcodes all-text params)."""
    body = _cstr(portal) + _cstr(stmt)
    body += struct.pack("!h", len(param_formats))
    for f in param_formats:
        body += struct.pack("!h", f)
    body += struct.pack("!h", len(params))
    for p in params:
        if p is None:
            body += struct.pack("!i", -1)
        else:
            body += struct.pack("!i", len(p)) + p
    body += struct.pack("!h", len(result_formats))
    for f in result_formats:
        body += struct.pack("!h", f)
    return _m(b"B", body)


def field_formats_of(msgs) -> list[int]:
    """Per-column format codes from the RowDescription 'T' message."""
    body = next(b for t, b in msgs if t == b"T")
    (ncols,) = struct.unpack("!h", body[:2])
    pos, fmts = 2, []
    for _ in range(ncols):
        end = body.index(b"\0", pos)
        pos = end + 1 + 16  # tableoid(4) attnum(2) oid(4) len(2) mod(4)
        fmts.append(struct.unpack("!h", body[pos : pos + 2])[0])
        pos += 2
    return fmts


@pytest.fixture(scope="module")
def server(spark):
    async def _run():
        srv = SparkPGServer(
            spark,
            port=0,
            pg_catalog=False,
            init_session=lambda s: register_tables(s, SF_SMOKE),
        )
        await srv.start()
        return srv

    loop = asyncio.new_event_loop()
    srv = loop.run_until_complete(_run())
    yield srv, loop
    loop.run_until_complete(srv.stop())
    loop.close()


def extended(server, sql, params=(), param_formats=(), result_formats=(1,)):
    srv, loop = server

    async def go():
        c = await PgClient.connect(srv.port)
        await c.send(
            _parse("", sql),
            _bind_fmt("", "", list(params), list(param_formats), list(result_formats)),
            _describe("P", ""),
            _execute(""),
            SYNC,
        )
        msgs = await c.until_ready()
        await c.close()
        return msgs

    return run(loop, go())


class TestBinaryResults:
    """One wire round-trip per binary-capable type; expected bytes come
    from binary_encoder — the same golden vectors the unit tests pin —
    so a drift between the socket path and the encoders is caught."""

    def test_int2_int4_int8(self, server):
        msgs = extended(
            server,
            "SELECT CAST(7 AS SMALLINT) AS a, CAST(-12345 AS INT) AS b, "
            "CAST(1099511627776 AS BIGINT) AS c",
        )
        assert field_formats_of(msgs) == [1, 1, 1]
        assert rows_of(msgs) == [[
            binary_encoder(T.ShortType())(7),
            binary_encoder(T.IntegerType())(-12345),
            binary_encoder(T.LongType())(1 << 40),
        ]]

    def test_float4_float8(self, server):
        msgs = extended(
            server,
            "SELECT CAST(1.5 AS FLOAT) AS f4, CAST(-2.25 AS DOUBLE) AS f8, "
            "DOUBLE('Infinity') AS inf, DOUBLE('NaN') AS nan",
        )
        [row] = rows_of(msgs)
        assert row[0] == binary_encoder(T.FloatType())(1.5)
        assert row[1] == binary_encoder(T.DoubleType())(-2.25)
        assert row[2] == struct.pack("!d", math.inf)
        # NaN: assert semantics, not a specific quiet-NaN bit pattern
        assert math.isnan(struct.unpack("!d", row[3])[0])

    def test_date_timestamp_pg_epoch(self, server):
        # PG binary date = days since 2000-01-01, timestamp = micros
        # since 2000-01-01 (converters.scala:156-208); session tz is UTC
        msgs = extended(
            server,
            "SELECT DATE '2024-03-01' AS d, "
            "TIMESTAMP_NTZ '2024-03-01 12:34:56.789' AS ts, "
            "TIMESTAMP '2024-03-01 12:34:56.789' AS tsz",
        )
        [row] = rows_of(msgs)
        assert row[0] == binary_encoder(T.DateType())(date(2024, 3, 1))
        want = binary_encoder(T.TimestampNTZType())(
            datetime(2024, 3, 1, 12, 34, 56, 789000)
        )
        assert row[1] == want
        assert row[2] == want  # UTC session: same instant, same micros
        # explicit day math: 2000-01-01 → 2024-03-01 is 8826 days
        assert struct.unpack("!i", row[0])[0] == (
            date(2024, 3, 1) - date(2000, 1, 1)
        ).days

    def test_bytea(self, server):
        msgs = extended(server, "SELECT X'DEADBEEF' AS b")
        assert rows_of(msgs) == [[b"\xde\xad\xbe\xef"]]

    def test_null_in_binary_mode(self, server):
        msgs = extended(
            server, "SELECT CAST(NULL AS INT) AS n, CAST(3 AS INT) AS m"
        )
        assert rows_of(msgs) == [[None, struct.pack("!i", 3)]]

    def test_mixed_per_column_formats(self, server):
        msgs = extended(
            server,
            "SELECT n_nationkey AS a, n_nationkey AS b, n_name AS c "
            "FROM nation WHERE n_nationkey = 3",
            result_formats=[0, 1, 0],
        )
        assert field_formats_of(msgs) == [0, 1, 0]
        [row] = rows_of(msgs)
        assert row[0] == b"3"
        assert row[1] == struct.pack("!q", 3) if len(row[1]) == 8 else struct.pack("!i", 3)
        assert row[2] == b"NATION_3"

    def test_non_capable_type_downgrades_to_text(self, server):
        # bool has no entry in BINARY_CAPABLE (reference
        # protocol.scala:214-228): a binary request must silently
        # downgrade, and RowDescription must SAY text — the contract
        # pgjdbc relies on to parse the row
        msgs = extended(server, "SELECT true AS flag", result_formats=[1])
        assert field_formats_of(msgs) == [0]
        assert rows_of(msgs) == [[b"t"]]

    def test_decimal_fixed_point_text_over_binary_request(self, server):
        # numeric is text-only (converters.scala:446): a binary request
        # downgrades to text, and the r8 encoder rule applies — the
        # text is ALWAYS fixed-point, never scientific (PG prints
        # '0.0000000000' where str(Decimal('0E-10')) is '0E-10')
        msgs = extended(
            server,
            "SELECT CAST(0 AS DECIMAL(20,10)) AS z, "
            "CAST(-1.5 AS DECIMAL(10,4)) AS n",
            result_formats=[1],
        )
        assert field_formats_of(msgs) == [0, 0]
        assert rows_of(msgs) == [[b"0.0000000000", b"-1.5000"]]

    def test_ddl_created_pg_column_types_over_socket(self, server):
        # r8/r9 DDL-type map end-to-end: PG type spellings in CREATE
        # TABLE (text, bare char, int8, T(n)[]) produce columns whose
        # wire formats and bytes match the mapped Spark types
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple(
                    "CREATE TABLE bw_ddl_t (a text, b char, c int8, "
                    "d varchar(5)[], e numeric(6,2)) USING parquet"
                )
                await c.simple(
                    "INSERT INTO bw_ddl_t VALUES "
                    "('x', 'y', 9, ARRAY['p','q'], 12.25)"
                )
                msgs = await c.simple(
                    "SELECT a, b, c, d, e FROM bw_ddl_t"
                )
            finally:
                # never leak the table into the shared session (a leak
                # fails parity hygiene for every downstream test)
                await c.simple("DROP TABLE IF EXISTS bw_ddl_t")
                await c.close()
            return msgs

        msgs = run(loop, go())
        assert rows_of(msgs) == [[
            b"x", b"y", b"9", b'{"p","q"}', b"12.25",
        ]]

    def test_single_format_code_broadcasts(self, server):
        # PG Bind: one format code applies to ALL result columns
        msgs = extended(
            server,
            "SELECT CAST(1 AS INT) AS a, CAST(2 AS BIGINT) AS b",
            result_formats=[1],
        )
        assert field_formats_of(msgs) == [1, 1]
        assert rows_of(msgs) == [[struct.pack("!i", 1), struct.pack("!q", 2)]]


class TestBinaryParams:
    def test_binary_int_float_text_bytea_params(self, server):
        # binary params carry no self-describing type — pgjdbc always
        # declares oids at Parse for them (unspecified-oid binary
        # params are rejected, tested below)
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse(
                    "pm",
                    "SELECT $1 + 1 AS a, $2 * 2.0 AS b, upper($3) AS c, "
                    "length($4) AS d",
                    [P.INT4.oid, P.FLOAT8.oid, P.VARCHAR.oid, P.BYTEA.oid],
                ),
                _bind_fmt(
                    "",
                    "pm",
                    [
                        struct.pack("!i", 41),
                        struct.pack("!d", 1.25),
                        b"abc",
                        b"\x00\xff\x10",
                    ],
                    [1, 1, 1, 1],
                    [0],
                ),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        assert rows_of(msgs) == [[b"42", b"2.5", b"ABC", b"3"]]

    def test_undeclared_oid_parse_defers_to_bind(self, server):
        # Parse with NO declared oids on parameterized SQL must still
        # ParseComplete (analysis defers); text-format params then bind
        # fine with unspecified oids
        msgs = extended(
            server,
            "SELECT $1 + 1 AS a",
            params=[b"41"],
            param_formats=[0],
            result_formats=[0],
        )
        assert b"1" in tags_of(msgs)  # ParseComplete
        assert rows_of(msgs) == [[b"42"]]

    def test_binary_param_oids(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse(
                    "sp",
                    "SELECT $1 + $2 AS s",
                    [P.INT8.oid, P.INT2.oid],
                ),
                _bind_fmt(
                    "",
                    "sp",
                    [struct.pack("!q", 1 << 35), struct.pack("!h", -2)],
                    [1, 1],
                    [1],
                ),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        [row] = rows_of(msgs)
        assert struct.unpack("!q", row[0])[0] == (1 << 35) - 2

    def test_unspecified_binary_date_param_rejected(self, server):
        # reference parity: binary Date/Timestamp params with an
        # unspecified oid are rejected (PgJdbcSuite.scala:744-777)
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("bad", "SELECT $1 AS v", [P.DATE.oid]),
                _bind_fmt("", "bad", [struct.pack("!i", 8826)], [1], [0]),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            ok = await c.simple("SELECT 1 AS x")
            await c.close()
            return msgs, ok

        msgs, ok = run(loop, go())
        assert b"E" in tags_of(msgs)
        assert rows_of(ok) == [[b"1"]]  # session survives the error


class TestBinaryTransferModeOff:
    def test_conf_downgrades_everything(self, spark):
        # spark.sql.server.binaryTransferMode=false (reference
        # SQLServerConf.scala:165): binary requests are ignored wholesale
        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(
                spark,
                port=0,
                pg_catalog=False,
                binary_transfer=False,
                init_session=lambda s: register_tables(s, SF_SMOKE),
            )
            await srv.start()
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("", "SELECT CAST(5 AS INT) AS v"),
                _bind_fmt("", "", [], [], [1]),
                _describe("P", ""),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            await srv.stop()
            return msgs

        try:
            msgs = loop.run_until_complete(go())
        finally:
            loop.close()
        assert field_formats_of(msgs) == [0]
        assert rows_of(msgs) == [[b"5"]]
