"""Robustness and remaining-surface tests: join hints, IGNORE NULLS,
CLUSTER BY, fragmented wire messages, oversized statements, the idle
reaper."""

from __future__ import annotations

import asyncio
import struct

import pytest

from spark_sql_server_spark.plans.inspect import executed_plan, join_strategies
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import (
    SYNC,
    PgClient,
    _bind,
    _execute,
    _m,
    _parse,
    _q,
    _startup,
    rows_of,
)


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    register_tables(spark, SF_SMOKE)
    yield


class TestRemainingSqlSurface:
    def test_broadcast_hint(self, spark):
        # §2.B join hints /*+ BROADCAST(t) */
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            no_hint = spark.sql(
                "SELECT count(*) FROM orders JOIN customer ON o_custkey = c_custkey"
            )
            hinted = spark.sql(
                "SELECT /*+ BROADCAST(customer) */ count(*) "
                "FROM orders JOIN customer ON o_custkey = c_custkey"
            )
            assert "BroadcastHashJoin" not in executed_plan(no_hint)
            assert "BroadcastHashJoin" in executed_plan(hinted)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    def test_merge_hint(self, spark):
        df = spark.sql(
            "SELECT /*+ MERGE(lineitem) */ count(*) "
            "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"
        )
        assert "SortMergeJoin" in join_strategies(df)

    def test_first_last_ignore_nulls(self, spark):
        rows = spark.sql(
            """SELECT first(v, true) AS f_skip, first(v) AS f_raw,
                      last(v, true) AS l_skip
               FROM (SELECT CASE WHEN id IN (0, 4) THEN NULL ELSE id END AS v
                     FROM range(5) ORDER BY id)"""
        ).collect()[0]
        assert rows.f_skip == 1
        assert rows.f_raw is None
        assert rows.l_skip == 3

    def test_ignore_nulls_window(self, spark):
        rows = spark.sql(
            """SELECT id,
                      last_value(v) IGNORE NULLS OVER (ORDER BY id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
               FROM (SELECT id, CASE WHEN id % 2 = 1 THEN NULL ELSE id END AS v
                     FROM range(6))
               ORDER BY id"""
        ).collect()
        assert [r.carried for r in rows] == [0, 0, 2, 2, 4, 4]

    def test_cluster_by(self, spark):
        rows = spark.sql(
            "SELECT o_custkey, o_orderkey FROM orders CLUSTER BY o_custkey"
        ).collect()
        assert len(rows) == spark.table("orders").count()


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


class TestWireRobustness:
    def test_fragmented_messages(self, server):
        """Messages split at arbitrary byte boundaries must reassemble
        (the reference buffers pendingBytes, protocol.scala:1238-1274;
        asyncio readexactly gives us the same)."""
        srv, loop = server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            payload = _startup({"user": "frag"})
            for i in range(0, len(payload), 3):  # drip 3 bytes at a time
                w.write(payload[i : i + 3])
                await w.drain()
                await asyncio.sleep(0.001)
            c = PgClient(r, w)
            await c.until_ready()
            q = _q("SELECT 11 AS v")
            for i in range(0, len(q), 2):
                w.write(q[i : i + 2])
                await w.drain()
            msgs = await c.until_ready()
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert rows_of(msgs) == [[b"11"]]

    def test_large_statement(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            big_in = ", ".join(str(i) for i in range(20000))
            msgs = await c.simple(
                f"SELECT count(*) AS n FROM nation WHERE n_nationkey IN ({big_in})"
            )
            await c.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert rows_of(msgs) == [[b"25"]]

    def test_abrupt_disconnect_mid_query(self, server):
        srv, loop = server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "rude"}))
            await w.drain()
            c = PgClient(r, w)
            await c.until_ready()
            w.write(_q("SELECT * FROM lineitem"))
            await w.drain()
            w.close()  # hang up without reading
            await asyncio.sleep(0.5)
            # the server must still serve new connections
            c2 = await PgClient.connect(srv.port)
            msgs = await c2.simple("SELECT 1 AS alive")
            await c2.close()
            return msgs

        msgs = loop.run_until_complete(go())
        assert rows_of(msgs) == [[b"1"]]


class TestIdleReaper:
    def test_idle_session_reaped(self, spark):
        loop = asyncio.new_event_loop()

        async def go():
            srv = SparkPGServer(
                spark, port=0, pg_catalog=False, idle_session_timeout=0.6
            )
            await srv.start()
            c = await PgClient.connect(srv.port)
            await c.simple("SELECT 1 AS x")
            assert len(srv._sessions) == 1
            await asyncio.sleep(1.5)
            n_sessions = len(srv._sessions)
            await srv.stop()
            return n_sessions

        n = loop.run_until_complete(go())
        loop.close()
        assert n == 0


class TestDeferredDml:
    def test_side_effecting_heads_are_commands(self):
        # Parse ('P') must not eagerly spark.sql() side-effecting DML:
        # on a v2/Delta catalog DELETE/UPDATE/MERGE execute eagerly, so a
        # Parse+Describe with no Execute would already mutate data
        from spark_sql_server_spark.protocol.server import _is_command

        assert _is_command("DELETE FROM t WHERE x = 1")
        assert _is_command("UPDATE t SET x = 1")
        assert _is_command("MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE")
        assert _is_command("  delete from t")
        assert not _is_command("SELECT 1")


class TestMalformedMessageBattery:
    """r10 VERDICT #7: malformed-message fuzz over the extended
    protocol — the server must answer ErrorResponse and stay alive
    (next connection or post-Sync statement works), never wedge."""

    def test_oversized_startup_packet(self, server):
        srv, loop = server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            # declared length 100 MB — PG caps startup packets at 10000
            w.write(struct.pack("!i", 100 * 1024 * 1024))
            await w.drain()
            hdr = await r.readexactly(5)
            (ln,) = struct.unpack("!i", hdr[1:])
            body = await r.readexactly(ln - 4)
            w.close()
            # server must still accept fresh connections
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("SELECT 1 AS alive")
            await c.close()
            return hdr[:1], body, msgs

        tag, body, msgs = loop.run_until_complete(go())
        assert tag == b"E" and b"08P01" in body
        assert rows_of(msgs) == [[b"1"]]

    def test_negative_startup_length(self, server):
        srv, loop = server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(struct.pack("!i", -5))
            await w.drain()
            hdr = await r.readexactly(5)
            (ln,) = struct.unpack("!i", hdr[1:])
            await r.readexactly(ln - 4)
            w.close()
            return hdr[:1]

        assert loop.run_until_complete(go()) == b"E"

    def test_truncated_parse_then_disconnect(self, server):
        """A Parse whose declared length never arrives must not wedge
        the accept loop."""
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            # declared 5000-byte Parse, ship only 20 bytes, hang up
            c.writer.write(b"P" + struct.pack("!i", 5004) + b"x" * 20)
            await c.writer.drain()
            c.writer.close()
            await asyncio.sleep(0.2)
            c2 = await PgClient.connect(srv.port)
            msgs = await c2.simple("SELECT 2 AS alive")
            await c2.close()
            return msgs

        assert rows_of(loop.run_until_complete(go())) == [[b"2"]]

    def test_hostile_message_length(self, server):
        """A 2 GB-declared message is a protocol violation, not an
        allocation."""
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            c.writer.write(b"Q" + struct.pack("!i", 0x7FFFFFFF))
            await c.writer.drain()
            hdr = await c.reader.readexactly(5)
            (ln,) = struct.unpack("!i", hdr[1:])
            body = await c.reader.readexactly(ln - 4)
            c.writer.close()
            c2 = await PgClient.connect(srv.port)
            msgs = await c2.simple("SELECT 3 AS alive")
            await c2.close()
            return hdr[:1], body, msgs

        tag, body, msgs = loop.run_until_complete(go())
        assert tag == b"E" and b"08P01" in body
        assert rows_of(msgs) == [[b"3"]]

    def test_bind_wrong_param_count_mid_pipeline(self, server):
        """P/B/E;P/B/E pipeline where the FIRST Bind omits the declared
        parameter: error once, skip to Sync, next pipeline is clean
        (PG's extended-protocol error recovery)."""
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(
                _parse("s1", "SELECT $1::int AS a"),
                _bind("", "s1", []),  # wrong: 0 params for 1 placeholder
                _execute(""),
                _parse("s2", "SELECT 42 AS b"),
                _bind("", "s2", []),
                _execute(""),
                SYNC,
            )
            msgs1 = await c.until_ready()
            # after Sync: a fresh pipeline must work end-to-end
            await c.send(
                _parse("s3", "SELECT $1::int + 1 AS c"),
                _bind("", "s3", [b"41"]),
                _execute(""),
                SYNC,
            )
            msgs2 = await c.until_ready()
            await c.close()
            return msgs1, msgs2

        msgs1, msgs2 = loop.run_until_complete(go())
        errs = [b for t, b in msgs1 if t == b"E"]
        assert len(errs) == 1  # one error, the rest of the pipeline skipped
        assert not rows_of(msgs1)  # s2 never executed
        assert rows_of(msgs2) == [[b"42"]]

    def test_bind_unknown_statement_recovers(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(_bind("", "never_parsed", []), _execute(""), SYNC)
            msgs1 = await c.until_ready()
            msgs2 = await c.simple("SELECT 7 AS ok")
            await c.close()
            return msgs1, msgs2

        msgs1, msgs2 = loop.run_until_complete(go())
        assert any(t == b"E" for t, _ in msgs1)
        assert rows_of(msgs2) == [[b"7"]]

    def test_execute_unknown_portal_recovers(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.send(_execute("ghost_portal"), SYNC)
            msgs1 = await c.until_ready()
            msgs2 = await c.simple("SELECT 8 AS ok")
            await c.close()
            return msgs1, msgs2

        msgs1, msgs2 = loop.run_until_complete(go())
        assert any(t == b"E" for t, _ in msgs1)
        assert rows_of(msgs2) == [[b"8"]]

    def test_unknown_message_tag_recovers(self, server):
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            c.writer.write(_m(b"z", b"junk"))  # no such frontend tag
            c.writer.write(SYNC)
            await c.writer.drain()
            msgs1 = await c.until_ready()
            msgs2 = await c.simple("SELECT 9 AS ok")
            await c.close()
            return msgs1, msgs2

        msgs1, msgs2 = loop.run_until_complete(go())
        assert any(t == b"E" for t, _ in msgs1)
        assert rows_of(msgs2) == [[b"9"]]

    def test_cancel_request_during_copy_in(self, server):
        """An interleaved CancelRequest while a COPY FROM STDIN is open
        must not wedge the session or the server; the COPY then finishes
        (or fails cleanly) and the connection answers new queries."""
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            await c.simple("CREATE TABLE robust_copy_t (a INT) USING parquet")
            try:
                await c.send(_q("COPY robust_copy_t FROM STDIN"))
                # read until CopyInResponse 'G'
                while True:
                    hdr = await c.reader.readexactly(5)
                    (ln,) = struct.unpack("!i", hdr[1:])
                    if ln > 4:
                        await c.reader.readexactly(ln - 4)
                    if hdr[:1] == b"G":
                        break
                c.writer.write(_m(b"d", b"1\n"))
                await c.writer.drain()
                # out-of-band cancel on a SECOND connection (PG wire shape)
                pid, secret = c.backend_key
                r2, w2 = await asyncio.open_connection("127.0.0.1", srv.port)
                w2.write(struct.pack("!iiii", 16, 80877102, pid, secret))
                await w2.drain()
                w2.close()
                await asyncio.sleep(0.2)
                c.writer.write(_m(b"d", b"2\n"))
                c.writer.write(_m(b"c"))  # CopyDone
                await c.writer.drain()
                msgs = await c.until_ready()
                after = await c.simple("SELECT count(*) AS n FROM robust_copy_t")
                return msgs, after
            finally:
                await c.simple("DROP TABLE IF EXISTS robust_copy_t")
                await c.close()

        msgs, after = loop.run_until_complete(go())
        # the COPY either completed (2 rows) or was cancelled cleanly —
        # both are live-server outcomes; wedging/crashing is the failure
        assert any(t in (b"C", b"E") for t, _ in msgs)
        assert rows_of(after) in ([[b"2"]], [[b"0"]])


class TestDeferredSessionInit:
    """The handshake goes out before the per-connection session init
    (health checks with stock timeouts — pg_isready's 3 s — must see a
    normal PG); the first dispatch awaits the init."""

    def test_terminate_before_first_statement(self, server):
        # pg_isready's probe shape: startup -> ReadyForQuery -> Terminate
        # with no statement in between; the deferred init task must be
        # cleaned up quietly and the server must keep serving
        srv, loop = server

        async def go():
            r, w = await asyncio.open_connection("127.0.0.1", srv.port)
            w.write(_startup({"user": "probe"}))
            await w.drain()
            c = PgClient(r, w)
            msgs = await c.until_ready()
            w.write(b"X" + struct.pack("!i", 4))
            await w.drain()
            w.close()
            # a fresh connection still works after the probe
            c2 = await PgClient.connect(srv.port)
            out = await c2.simple("SELECT 5 AS v")
            await c2.close()
            return msgs, out

        msgs, out = loop.run_until_complete(go())
        assert msgs[0][0] == b"R"  # AuthenticationOk came first
        assert rows_of(out) == [[b"5"]]

    def test_first_statement_sees_registered_tables(self, server):
        # the very first message on a fresh connection races the deferred
        # init — dispatch must await it, so the registered views resolve
        srv, loop = server

        async def go():
            c = await PgClient.connect(srv.port)
            out = await c.simple("SELECT count(*) AS n FROM region")
            await c.close()
            return out

        assert rows_of(loop.run_until_complete(go())) == [[b"5"]]
