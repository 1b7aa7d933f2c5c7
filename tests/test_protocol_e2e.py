"""End-to-end PG wire-protocol tests over a real TCP socket.

Raw-socket V3 client (no psycopg2 in this container) — the Python twin
of the reference's PgV3ProtocolScenarioSuite golden message traces plus
the PgJdbcSuite behaviors: cursor-mode fetch (maxRows →
PortalSuspended), SET returning zero rows, COMMIT rejection,
multi-session conf isolation.
"""

from __future__ import annotations

import asyncio
import struct

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE


def _startup(params: dict[str, str]) -> bytes:
    body = struct.pack("!i", 196608)
    for k, v in params.items():
        body += k.encode() + b"\0" + v.encode() + b"\0"
    body += b"\0"
    return struct.pack("!i", len(body) + 4) + body


def _m(tag: bytes, body: bytes = b"") -> bytes:
    return tag + struct.pack("!i", len(body) + 4) + body


def _cstr(s: str) -> bytes:
    return s.encode() + b"\0"


def _q(sql: str) -> bytes:
    return _m(b"Q", _cstr(sql))


def _parse(name: str, sql: str, oids: list[int] = ()) -> bytes:
    body = _cstr(name) + _cstr(sql) + struct.pack("!h", len(oids))
    for o in oids:
        body += struct.pack("!i", o)
    return _m(b"P", body)


def _bind(
    portal: str,
    stmt: str,
    params: list[bytes | None] = (),
    result_formats: list[int] = (),
) -> bytes:
    body = _cstr(portal) + _cstr(stmt) + struct.pack("!h", 0)
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


def _execute(portal: str, max_rows: int = 0) -> bytes:
    return _m(b"E", _cstr(portal) + struct.pack("!i", max_rows))


def _describe(kind: str, name: str) -> bytes:
    return _m(b"D", kind.encode() + _cstr(name))


SYNC = _m(b"S")
TERMINATE = _m(b"X")


class PgClient:
    """Minimal blocking-ish async PG V3 test client."""

    def __init__(self, reader, writer):
        self.reader = reader
        self.writer = writer

    @classmethod
    async def connect(cls, port: int, **params) -> "PgClient":
        r, w = await asyncio.open_connection("127.0.0.1", port)
        w.write(_startup({"user": "test", **params}))
        await w.drain()
        c = cls(r, w)
        msgs = await c.until_ready()
        assert msgs[0][0] == b"R"
        c.backend_key = next(
            struct.unpack("!ii", b) for t, b in msgs if t == b"K"
        )
        return c

    async def until_ready(self):
        msgs = []
        while True:
            hdr = await self.reader.readexactly(5)
            tag = hdr[:1]
            (ln,) = struct.unpack("!i", hdr[1:])
            body = await self.reader.readexactly(ln - 4) if ln > 4 else b""
            msgs.append((tag, body))
            if tag == b"Z":
                return msgs

    async def send(self, *chunks: bytes):
        for c in chunks:
            self.writer.write(c)
        await self.writer.drain()

    async def simple(self, sql: str):
        await self.send(_q(sql))
        return await self.until_ready()

    async def close(self):
        await self.send(TERMINATE)
        self.writer.close()


def rows_of(msgs) -> list[list[bytes | None]]:
    out = []
    for tag, body in msgs:
        if tag != b"D":
            continue
        ncols = struct.unpack("!h", body[:2])[0]
        pos, vals = 2, []
        for _ in range(ncols):
            (ln,) = struct.unpack("!i", body[pos : pos + 4])
            pos += 4
            if ln == -1:
                vals.append(None)
            else:
                vals.append(body[pos : pos + ln])
                pos += ln
        out.append(vals)
    return out


def tags_of(msgs) -> list[bytes]:
    return [t for t, _ in msgs]


def completes_of(msgs) -> list[str]:
    return [b.rstrip(b"\0").decode() for t, b in msgs if t == b"C"]


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


def run(loop, coro):
    return loop.run_until_complete(coro)


class TestSimpleQuery:
    def test_select_group_by(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1 ORDER BY 1"
            )
            await c.close()
            return msgs

        msgs = run(loop, go())
        assert tags_of(msgs)[0] == b"T"
        rows = rows_of(msgs)
        assert len(rows) == 5
        assert rows[0][0] == b"1-URGENT"
        assert completes_of(msgs) == ["SELECT 5"]

    def test_dialect_over_wire(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                "SELECT r::int8 AS v FROM generate_series(1,3) AS s(r) WHERE 'abc' ~ 'a.c'"
            )
            await c.close()
            return msgs

        msgs = run(loop, go())
        assert [r[0] for r in rows_of(msgs)] == [b"1", b"2", b"3"]

    def test_multi_statement(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("BEGIN; SET x.y = 1; SELECT 1 AS one")
            await c.close()
            return msgs

        msgs = run(loop, go())
        assert completes_of(msgs) == ["BEGIN", "SET", "SELECT 1"]

    def test_commit_rejected(self, server):
        # reference parity: PgJdbcSuite.scala:1135-1142
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("COMMIT")
            await c.close()
            return msgs

        msgs = run(loop, go())
        assert tags_of(msgs) == [b"E", b"Z"]

    def test_error_then_recover(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            bad = await c.simple("SELECT nope FROM nowhere")
            good = await c.simple("SELECT 42 AS v")
            await c.close()
            return bad, good

        bad, good = run(loop, go())
        assert tags_of(bad) == [b"E", b"Z"]
        assert rows_of(good) == [[b"42"]]

    def test_empty_query(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("")
            await c.close()
            return msgs

        msgs = run(loop, go())
        assert tags_of(msgs) == [b"I", b"Z"]

    def test_temp_views_isolated_per_session(self, server):
        # multi-session mode: temp views are per-connection, the data
        # cache is shared (reference PgJdbcSuite multi-session tests)
        srv, loop = server

        async def go():
            c1 = await PgClient.connect(srv.port)
            c2 = await PgClient.connect(srv.port)
            ok = await c1.simple(
                "CREATE OR REPLACE TEMPORARY VIEW my_private AS SELECT 1 AS x"
            )
            see1 = await c1.simple("SELECT * FROM my_private")
            see2 = await c2.simple("SELECT * FROM my_private")
            await c1.close()
            await c2.close()
            return ok, see1, see2

        ok, see1, see2 = run(loop, go())
        assert not any(t == b"E" for t, _ in ok)
        assert rows_of(see1) == [[b"1"]]
        assert any(t == b"E" for t, _ in see2)  # not visible cross-session

    def test_set_isolated_per_session(self, server):
        # multi-session mode: conf isolated across connections
        # (reference default, SparkSQLServiceManager.scala:112-117)
        srv, loop = server

        async def go():
            c1 = await PgClient.connect(srv.port)
            c2 = await PgClient.connect(srv.port)
            await c1.simple("SET spark.sql.shuffle.partitions = 7")
            m1 = await c1.simple("SET spark.sql.shuffle.partitions")
            m2 = await c2.simple("SET spark.sql.shuffle.partitions")
            await c1.close()
            await c2.close()
            return m1, m2

        m1, m2 = run(loop, go())
        v1 = rows_of(m1)[0][1]
        v2 = rows_of(m2)[0][1]
        assert v1 == b"7"
        assert v2 != b"7"


class TestPgRegressionDDLReplays:
    """PG-dialect DDL sequences replayed over the socket — wire ports
    of the reference's postgreSQL/insert.sql and create_view.sql inputs
    (reference sql-tests/inputs/postgreSQL/; the table/view lifecycles
    the corpus runner can't express as single row-compare statements)."""

    def test_insert_sql_replay(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            out = []
            try:
                out.append(await c.simple(
                    "CREATE TABLE inserttest_w (col1 int, col2 int, "
                    "col3 text) USING parquet"
                ))
                for stmt in (
                    "insert into inserttest_w values (NULL, 3, 'testing')",
                    "insert into inserttest_w values (NULL, 5, 'testing')",
                    "insert into inserttest_w values (NULL, 5, 'test')",
                    "insert into inserttest_w values (NULL, 7, 'testing')",
                ):
                    out.append(await c.simple(stmt))
                sel = await c.simple(
                    "select col2, col3 from inserttest_w "
                    "order by col2, col3"
                )
                # the long-value row (PG uses repeat('x', 10000))
                await c.simple(
                    "insert into inserttest_w values "
                    "(30, 50, repeat('x', 100))"
                )
                lens = await c.simple(
                    "select col1, col2, char_length(col3) AS len "
                    "from inserttest_w where col2 = 50"
                )
            finally:
                drop = await c.simple("DROP TABLE IF EXISTS inserttest_w")
                await c.close()
            return out, sel, lens, drop

        out, sel, lens, drop = run(loop, go())
        for msgs in out:
            assert not any(t == b"E" for t, _ in msgs)
        # PG command tags carry the real written-row count
        for msgs in out[1:]:
            assert completes_of(msgs) == ["INSERT 0 1"]
        assert rows_of(sel) == [
            [b"3", b"testing"],
            [b"5", b"test"],
            [b"5", b"testing"],
            [b"7", b"testing"],
        ]
        assert rows_of(lens) == [[b"30", b"50", b"100"]]
        assert not any(t == b"E" for t, _ in drop)

    def test_create_view_sql_replay(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            try:
                mk = await c.simple(
                    "CREATE TABLE emp_w (name varchar(20), age int, "
                    "salary int, manager varchar(20)) USING parquet"
                )
                vw = await c.simple(
                    "CREATE VIEW toyemp_w AS SELECT name, age, "
                    "12*salary AS annualsal FROM emp_w"
                )
                await c.simple(
                    "insert into emp_w values ('sam', 30, 2000, 'bill'), "
                    "('claire', 25, 3000, 'bill')"
                )
                sel = await c.simple(
                    "SELECT name, annualsal FROM toyemp_w ORDER BY name"
                )
            finally:
                d1 = await c.simple("DROP VIEW IF EXISTS toyemp_w")
                d2 = await c.simple("DROP TABLE IF EXISTS emp_w")
                await c.close()
            return mk, vw, sel, d1, d2

        mk, vw, sel, d1, d2 = run(loop, go())
        for msgs in (mk, vw, d1, d2):
            assert not any(t == b"E" for t, _ in msgs)
        assert rows_of(sel) == [
            [b"claire", b"36000"],
            [b"sam", b"24000"],
        ]


class TestOrmStartupScenarios:
    """Realistic client connect-time pipelines replayed verbatim —
    broader golden traces than the reference's
    PgV3ProtocolScenarioSuite.scala:25-92 (r7 VERDICT task 8): the
    SQLAlchemy postgres dialect's startup probes, an ORM-style
    multi-statement extended-protocol pipeline with a single Sync, and
    the pgbouncer between-clients reset sequence."""

    def test_sqlalchemy_startup_sequence(self, server):
        # the queries SQLAlchemy's postgresql dialect issues on connect
        srv, loop = server
        seq = [
            "show standard_conforming_strings",
            "select pg_catalog.version()",
            "select current_schema()",
            "SELECT CAST('test plain returns' AS VARCHAR(60)) AS anon_1",
            "SELECT CAST('test unicode returns' AS VARCHAR(60)) AS anon_1",
            "show transaction isolation level",
        ]

        async def go():
            c = await PgClient.connect(srv.port)
            out = [await c.simple(q) for q in seq]
            await c.close()
            return out

        out = run(loop, go())
        for q, msgs in zip(seq, out):
            assert not any(t == b"E" for t, _ in msgs), f"error for: {q}"
        # version() satisfies ORM connect-time regexes
        assert rows_of(out[1])[0][0].startswith(b"PostgreSQL ")
        assert rows_of(out[3]) == [[b"test plain returns"]]

    def test_extended_pipeline_single_sync(self, server):
        # ORM startup as ONE pipeline: several Parse/Bind/Execute
        # rounds queued before a single Sync — the server must answer
        # each in order and emit exactly one ReadyForQuery at the end
        srv, loop = server
        stmts = [
            "SET application_name = 'orm_pipeline'",
            "SELECT version()",
            "SELECT count(*) FROM pg_catalog.pg_namespace",
            "SELECT 1",
        ]

        async def go():
            c = await PgClient.connect(srv.port)
            chunks = []
            for i, q in enumerate(stmts):
                name = f"p{i}"
                chunks += [_parse(name, q), _bind("", name), _execute("")]
            chunks.append(SYNC)
            await c.send(*chunks)
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        tags = tags_of(msgs)
        assert tags.count(b"Z") == 1 and tags[-1] == b"Z"
        assert tags.count(b"1") == len(stmts)  # ParseComplete each
        assert tags.count(b"2") == len(stmts)  # BindComplete each
        completes = completes_of(msgs)
        assert len(completes) == len(stmts)
        assert completes[0] == "SET"
        rows = rows_of(msgs)
        assert rows[0][0].startswith(b"PostgreSQL ")
        assert rows[-1] == [b"1"]

    def test_pgbouncer_between_clients_reset(self, server):
        # pgbouncer's server_reset_query sequence between clients:
        # session state set by client A must not leak to "client B"
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.simple("SET statement_timeout = '5s'")
            await c.simple(
                "CREATE OR REPLACE TEMPORARY VIEW bouncer_tmp AS SELECT 1 AS x"
            )
            before = await c.simple("SHOW statement_timeout")
            await c.simple("DISCARD ALL")
            after = await c.simple("SHOW statement_timeout")
            gone = await c.simple("SELECT * FROM bouncer_tmp")
            await c.close()
            return before, after, gone

        before, after, gone = run(loop, go())
        assert rows_of(before) == [[b"5s"]]
        assert rows_of(after) != [[b"5s"]]  # reset to the default
        assert any(t == b"E" for t, _ in gone)  # temp view dropped


class TestExtendedProtocol:
    def test_parse_bind_execute_with_param(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("s1", "SELECT n_name FROM nation WHERE n_nationkey = $1", [23]),
                _bind("", "s1", [b"3"]),
                _describe("P", ""),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        tags = tags_of(msgs)
        assert tags[:3] == [b"1", b"2", b"T"]
        assert rows_of(msgs) == [[b"NATION_3"]]

    def test_describe_statement_schema(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("s2", "SELECT n_nationkey, n_name FROM nation"),
                _describe("S", "s2"),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        t = next(b for tag, b in msgs if tag == b"T")
        assert struct.unpack("!h", t[:2])[0] == 2
        assert b"n_nationkey\x00" in t and b"n_name\x00" in t

    def test_describe_parameterized_statement(self, server):
        # JDBC PreparedStatement.getMetaData() before Bind: schema from
        # NULL-bound analysis (reference's ParameterPlaceHolder trick)
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("sp", "SELECT n_name FROM nation WHERE n_nationkey = $1", [23]),
                _describe("S", "sp"),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        tags = tags_of(msgs)
        assert b"t" in tags  # ParameterDescription
        assert b"T" in tags  # RowDescription (not NoData)
        t = next(b for tag, b in msgs if tag == b"T")
        assert b"n_name\x00" in t

    def test_cursor_fetch_portal_suspended(self, server):
        # maxRows pacing: Execute(3) on 25 rows → 3 rows + PortalSuspended,
        # repeat until CommandComplete (protocol.scala:431-504)
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("s3", "SELECT n_nationkey FROM nation ORDER BY n_nationkey"),
                _bind("cur1", "s3"),
                _execute("cur1", 10),
                SYNC,
            )
            first = await c.until_ready()
            await c.send(_execute("cur1", 10), SYNC)
            second = await c.until_ready()
            await c.send(_execute("cur1", 10), SYNC)
            third = await c.until_ready()
            await c.close()
            return first, second, third

        first, second, third = run(loop, go())
        assert len(rows_of(first)) == 10
        assert b"s" in tags_of(first)  # PortalSuspended
        assert len(rows_of(second)) == 10
        assert b"s" in tags_of(second)
        assert len(rows_of(third)) == 5
        assert completes_of(third) == ["FETCH 5"]

    def test_binary_result_format(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("s4", "SELECT n_nationkey FROM nation WHERE n_nationkey = 1"),
                _bind("", "s4", [], [1]),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = run(loop, go())
        rows = rows_of(msgs)
        assert rows == [[struct.pack("!i", 1)]]

    def test_error_skips_until_sync(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("bad", "SELECT broken FROM nowhere"),
                _bind("", "bad"),
                _execute(""),
                SYNC,
            )
            msgs = await c.until_ready()
            ok = await c.simple("SELECT 1 AS x")
            await c.close()
            return msgs, ok

        msgs, ok = run(loop, go())
        assert b"E" in tags_of(msgs)
        assert tags_of(msgs)[-1] == b"Z"
        assert rows_of(ok) == [[b"1"]]


class TestArrowFastPath:
    def test_non_incremental_same_bytes(self, spark):
        """incremental_collect=False takes the Arrow columnar path —
        results must be byte-identical to the iterator path."""
        loop = asyncio.new_event_loop()

        async def go():
            sql = (
                "SELECT n_nationkey, n_name, CAST(n_regionkey AS DOUBLE) / 2 AS h, "
                "CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_name END AS maybe, "
                # timestamp + date columns pin the arrow datetime fast
                # path to the python encoder's format
                "TIMESTAMP '2024-03-01 12:34:56.789' + make_interval(0,0,0,0,0,0,n_nationkey) AS ts, "
                "DATE '2024-03-01' AS d, "
                # adversarial floats for the vectorized repr path: 35.0
                # keeps its '.0', exponent thresholds match repr, -0.0
                # and specials survive the bit-pattern unique
                "ELT(1 + n_nationkey % 7, 35.0D, 1E16D, 1E15D, 1.5E-5D, "
                "    -0.0D, DOUBLE('NaN'), DOUBLE('Infinity')) AS f, "
                "n_nationkey % 3 = 0 AS flag "
                "FROM nation ORDER BY n_nationkey"
            )
            out = []
            for incremental in (True, False):
                srv = SparkPGServer(
                    spark,
                    port=0,
                    pg_catalog=False,
                    incremental_collect=incremental,
                    init_session=lambda s: register_tables(s, SF_SMOKE),
                )
                await srv.start()
                c = await PgClient.connect(srv.port)
                msgs = await c.simple(sql)
                await c.close()
                await srv.stop()
                out.append(rows_of(msgs))
            return out

        iter_rows, arrow_rows = loop.run_until_complete(go())
        loop.close()
        assert iter_rows == arrow_rows
        assert len(arrow_rows) == 25
        assert arrow_rows[0][3] is None  # NULL preserved through arrow path


class TestIncrementalToggle:
    def test_set_incremental_collect_per_session(self, server):
        # reference conf spark.sql.server.incrementalCollect.enabled is
        # session-scoped and runtime-toggleable
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            before = await c.simple("SELECT n_nationkey FROM nation ORDER BY 1 LIMIT 3")
            await c.simple("SET spark.sql.server.incrementalCollect.enabled = false")
            state = next(
                s for s in srv._sessions.values() if s.incremental_collect is False
            )
            after = await c.simple("SELECT n_nationkey FROM nation ORDER BY 1 LIMIT 3")
            await c.close()
            return before, after, state.incremental_collect

        before, after, flag = run(loop, go())
        assert rows_of(before) == rows_of(after) == [[b"0"], [b"1"], [b"2"]]
        assert flag is False


class TestCancellation:
    def test_cancel_request_cancels_job_group(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            pid, secret = c.backend_key
            # out-of-band cancel on a NEW connection (protocol.scala:1168-1184)
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            body = struct.pack("!iii", 80877102, pid, secret)
            w.write(struct.pack("!i", len(body) + 4) + body)
            await w.drain()
            w.close()
            await asyncio.sleep(0.2)
            # session must still answer queries afterwards
            ok = await c.simple("SELECT 7 AS v")
            await c.close()
            return ok

        ok = run(loop, go())
        assert rows_of(ok) == [[b"7"]]


class TestZeroColumnResults:
    """r10: a genuine zero-column SELECT (a quotedRegexColumnNames
    projection matching no columns — PG itself allows `SELECT FROM t`)
    must keep its ROW COUNT on the wire: RowDescription with 0 fields +
    one empty DataRow per row + 'SELECT n'. Before r10 the simple
    protocol conflated it with the no-result command path and the
    extended protocol crashed in the batch assembler."""

    def test_simple_protocol(self, server):
        srv, loop = server

        async def outer():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple(
                    "SET spark.sql.parser.quotedRegexColumnNames=true")
                msgs = await c.simple("SELECT `(zz)` FROM region")
                await c.simple(
                    "RESET spark.sql.parser.quotedRegexColumnNames")
                return msgs
            finally:
                await c.close()

        msgs = run(loop, outer())
        assert rows_of(msgs) == [[]] * 5
        assert b"SELECT 5\x00" in [b for t, b in msgs if t == b"C"]

    def test_extended_protocol_with_cursor_pacing(self, server):
        srv, loop = server

        async def outer():
            c = await PgClient.connect(srv.port)
            try:
                await c.simple(
                    "SET spark.sql.parser.quotedRegexColumnNames=true")
                await c.send(
                    _parse("zc", "SELECT `(zz)` FROM region"),
                    _describe("S", "zc"),
                    _bind("", "zc"), _execute(""), _m(b"S"))
                full = await c.until_ready()
                await c.send(_bind("pz", "zc"), _execute("pz", 2), _m(b"S"))
                paced = await c.until_ready()
                await c.simple(
                    "RESET spark.sql.parser.quotedRegexColumnNames")
                return full, paced
            finally:
                await c.close()

        full, paced = run(loop, outer())
        # RowDescription present with ZERO fields (2-byte body)
        assert any(t == b"T" and len(b) == 2 for t, b in full)
        assert rows_of(full) == [[]] * 5
        assert b"SELECT 5\x00" in [b for t, b in full if t == b"C"]
        # maxRows pacing still suspends the portal
        assert rows_of(paced) == [[]] * 2
        assert any(t == b"s" for t, _ in paced)
