"""PG RESET / DISCARD — the session-reset surface connection poolers
use (pgbouncer issues ``DISCARD ALL`` between pooled clients; drivers
``RESET`` individual settings). Beyond-reference: the reference has no
session-reset statement at all, but any pooled deployment needs it.
"""

from __future__ import annotations

import asyncio
import struct

import pytest

from spark_sql_server_spark.dialect.commands import (
    StatementClass,
    classify_statement,
)
from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, completes_of, rows_of


class TestClassify:
    def test_reset_forms(self):
        st = classify_statement("RESET application_name")
        assert st.cls is StatementClass.RESET
        assert st.cursor_name == "application_name" and st.tag == "RESET"
        st = classify_statement("RESET ALL")
        assert st.cls is StatementClass.RESET and st.cursor_name == "ALL"
        # Spark's bare RESET (reset every conf) stays a passthrough query
        assert classify_statement("RESET").cls is StatementClass.QUERY

    def test_discard_forms(self):
        assert classify_statement("DISCARD ALL").tag == "DISCARD ALL"
        assert classify_statement("discard temporary").tag == "DISCARD TEMP"
        assert classify_statement("DISCARD PLANS").tag == "DISCARD PLANS"
        assert classify_statement("DISCARD SEQUENCES").tag == "DISCARD SEQUENCES"
        # unknown target falls through (Spark rejects it as a query)
        assert classify_statement("DISCARD NONSENSE").cls is StatementClass.QUERY


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


class TestResetE2E:
    def test_reset_restores_default(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            before = await c.simple("SHOW application_name")
            await c.simple("SET application_name = 'pooler-test'")
            after_set = await c.simple("SHOW application_name")
            reset = await c.simple("RESET application_name")
            after_reset = await c.simple("SHOW application_name")
            await c.close()
            return before, after_set, reset, after_reset

        before, after_set, reset, after_reset = _run(server, go)
        assert rows_of(after_set) == [[b"pooler-test"]]
        assert completes_of(reset) == ["RESET"]
        assert rows_of(after_reset) == rows_of(before)

    def test_set_to_default_is_reset(self, server):
        """PG: `SET x TO DEFAULT` is equivalent to `RESET x` (and must
        NOT store the literal string DEFAULT)."""

        async def go(srv):
            c = await PgClient.connect(srv.port)
            before = await c.simple("SHOW application_name")
            await c.simple("SET application_name = 'temp-name'")
            m = await c.simple("SET application_name TO DEFAULT")
            after = await c.simple("SHOW application_name")
            await c.close()
            return before, m, after

        before, m, after = _run(server, go)
        assert completes_of(m) == ["SET"]
        assert rows_of(after) == rows_of(before)

    def test_reset_of_never_set_key_is_lenient(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m = await c.simple("RESET statement_timeout")
            ok = await c.simple("SELECT 1 AS v")
            await c.close()
            return m, ok

        m, ok = _run(server, go)
        assert completes_of(m) == ["RESET"]
        assert rows_of(ok) == [[b"1"]]


class TestStatementTimeoutE2E:
    def test_timeout_cancels_and_session_survives(self, server):
        """A statement that exceeds statement_timeout must fail with a
        clean 57014-class error and the session must stay usable; after
        RESET the same query runs to completion."""

        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("SET statement_timeout = '5ms'")
            shown = await c.simple("SHOW statement_timeout")
            slow = await c.simple(
                "SELECT count(*) AS n FROM lineitem l1 "
                "JOIN lineitem l2 ON l1.l_quantity = l2.l_quantity"
            )
            reset = await c.simple("RESET statement_timeout")
            fast = await c.simple("SELECT count(*) AS n FROM region")
            await c.close()
            return shown, slow, reset, fast

        shown, slow, reset, fast = _run(server, go)
        assert rows_of(shown) == [[b"5ms"]]
        errs = [f for t, f in slow if t == b"E"]
        assert errs, "expected a timeout error"
        blob = b"".join(errs)
        assert b"57014" in blob and b"statement timeout" in blob
        # commands (RESET) bypass Spark, so they work even under a tiny
        # timeout — and afterwards queries run to completion again
        assert completes_of(reset) == ["RESET"]
        assert rows_of(fast) == [[b"5"]]

    def test_zero_and_units_parse(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m0 = await c.simple("SET statement_timeout = 0")
            q0 = await c.simple("SELECT count(*) AS n FROM nation")
            m1 = await c.simple("SET statement_timeout = '30s'")
            q1 = await c.simple("SELECT count(*) AS n FROM nation")
            bad = await c.simple("SET statement_timeout = 'abc'")
            ok = await c.simple("SELECT 8 AS v")
            await c.simple("RESET statement_timeout")
            await c.close()
            return m0, q0, m1, q1, bad, ok

        m0, q0, m1, q1, bad, ok = _run(server, go)
        assert completes_of(m0) == ["SET"] and rows_of(q0) == [[b"25"]]
        assert completes_of(m1) == ["SET"] and rows_of(q1) == [[b"25"]]
        errs = [f for t, f in bad if t == b"E"]
        assert errs and b"22023" in b"".join(errs)
        assert rows_of(ok) == [[b"8"]]

    def test_discard_all_clears_timeout(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("SET statement_timeout = '5ms'")
            await c.simple("DISCARD ALL")
            # would have timed out under 5ms — must succeed now
            big = await c.simple(
                "SELECT count(*) AS n FROM lineitem l1 "
                "JOIN lineitem l2 ON l1.l_quantity = l2.l_quantity"
            )
            await c.close()
            return big

        big = _run(server, go)
        assert not any(t == b"E" for t, _ in big)
        assert len(rows_of(big)) == 1


class TestDiscardE2E:
    def test_discard_all_pgbouncer_sequence(self, server):
        """The exact shape pgbouncer runs between pooled clients: the
        next client must see default GUCs and no prepared statements or
        cursors from the previous one."""

        async def go(srv):
            c = await PgClient.connect(srv.port)
            default_app = await c.simple("SHOW application_name")
            await c.simple("SET application_name = 'client-a'")
            await c.simple(
                "PREPARE leftover AS SELECT n_name FROM nation "
                "WHERE n_nationkey = 0"
            )
            await c.simple(
                "DECLARE cur_leftover CURSOR FOR SELECT r_name FROM region"
            )
            discard = await c.simple("DISCARD ALL")
            app = await c.simple("SHOW application_name")
            exec_gone = await c.simple("EXECUTE leftover")
            ok_after_err = await c.simple("SELECT 2 AS v")
            fetch_gone = await c.simple("FETCH ALL FROM cur_leftover")
            ok2 = await c.simple("SELECT 3 AS v")
            await c.close()
            return (default_app, discard, app, exec_gone, ok_after_err,
                    fetch_gone, ok2)

        (default_app, discard, app, exec_gone, ok_after_err,
         fetch_gone, ok2) = _run(server, go)
        assert completes_of(discard) == ["DISCARD ALL"]
        assert rows_of(app) == rows_of(default_app)
        # prepared statement and cursor are gone → clean errors
        assert any(t == b"E" for t, _ in exec_gone)
        assert rows_of(ok_after_err) == [[b"2"]]
        assert any(t == b"E" for t, _ in fetch_gone)
        assert rows_of(ok2) == [[b"3"]]

    def test_discard_noop_variants(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            m1 = await c.simple("DISCARD PLANS")
            m2 = await c.simple("DISCARD SEQUENCES")
            m3 = await c.simple("DISCARD TEMP")
            ok = await c.simple("SELECT 4 AS v")
            await c.close()
            return m1, m2, m3, ok

        m1, m2, m3, ok = _run(server, go)
        assert completes_of(m1) == ["DISCARD PLANS"]
        assert completes_of(m2) == ["DISCARD SEQUENCES"]
        assert completes_of(m3) == ["DISCARD TEMP"]
        assert rows_of(ok) == [[b"4"]]


class TestBackendCtlE2E:
    def test_cancel_backend_boolean_results(self, server):
        """pg_cancel_backend: 't' for a live pid (cancels its job
        group), 'f' for an unknown pid — the shapes monitoring tools
        issue verbatim against pg_stat_activity."""

        async def go(srv):
            a = await PgClient.connect(srv.port)
            b = await PgClient.connect(srv.port)
            b_pid = b.backend_key[0]
            ok = await a.simple(f"SELECT pg_cancel_backend({b_pid})")
            missing = await a.simple("SELECT pg_cancel_backend(999999)")
            # the cancelled session had no running job — still usable
            alive = await b.simple("SELECT 11 AS v")
            await a.close()
            await b.close()
            return ok, missing, alive

        ok, missing, alive = _run(server, go)
        assert rows_of(ok) == [[b"t"]] and completes_of(ok) == ["SELECT 1"]
        assert rows_of(missing) == [[b"f"]]
        assert rows_of(alive) == [[b"11"]]

    def test_terminate_backend_closes_connection(self, server):
        async def go(srv):
            a = await PgClient.connect(srv.port)
            b = await PgClient.connect(srv.port)
            b_pid = b.backend_key[0]
            term = await a.simple(f"SELECT pg_terminate_backend({b_pid})")
            # b's socket is closed by the server
            try:
                await asyncio.wait_for(b.simple("SELECT 1 AS v"), 5)
                b_dead = False
            except (asyncio.IncompleteReadError, ConnectionError,
                    asyncio.TimeoutError):
                b_dead = True
            a_ok = await a.simple("SELECT 12 AS v")
            await a.close()
            return term, b_dead, a_ok

        term, b_dead, a_ok = _run(server, go)
        assert rows_of(term) == [[b"t"]]
        assert b_dead
        assert rows_of(a_ok) == [[b"12"]]

    def test_pid_matches_pg_stat_activity(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            pid = c.backend_key[0]
            rows = await c.simple(
                "SELECT pid FROM pg_stat_activity ORDER BY pid"
            )
            await c.close()
            return pid, rows

        pid, rows = _run(server, go)
        pids = [int(r[0]) for r in rows_of(rows)]
        assert pid in pids

NOTIFY_SQL = "NOTIFY events, 'hello ''world'''"


class TestListenNotifyE2E:
    def test_notify_reaches_listener_with_payload(self, server):
        """psycopg2-style pub/sub: LISTEN on one session, NOTIFY from
        another — the 'A' NotificationResponse carries the notifier's
        pid, the channel, and the payload."""

        async def go(srv):
            sub = await PgClient.connect(srv.port)
            pub = await PgClient.connect(srv.port)
            await sub.simple("LISTEN events")
            await pub.simple(NOTIFY_SQL)
            # the listener sees the notification with its next read
            msgs = await sub.simple("SELECT 1 AS v")
            await sub.close()
            await pub.close()
            return pub.backend_key[0], msgs

        pub_pid, msgs = _run(server, go)
        notes = [b for t, b in msgs if t == b"A"]
        assert len(notes) == 1
        pid = struct.unpack("!i", notes[0][:4])[0]
        channel, payload, _ = notes[0][4:].split(b"\x00")
        assert pid == pub_pid
        assert channel == b"events" and payload == b"hello 'world'"

    def test_self_notification_and_unlisten(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("LISTEN chan_a")
            first = await c.simple("NOTIFY chan_a")
            await c.simple("UNLISTEN chan_a")
            second = await c.simple("NOTIFY chan_a")
            probe = await c.simple("SELECT 1 AS v")
            await c.close()
            return first, second, probe

        first, second, probe = _run(server, go)
        # PG delivers self-notifications
        assert any(t == b"A" for t, _ in first)
        # after UNLISTEN nothing more arrives
        assert not any(t == b"A" for t, _ in second)
        assert not any(t == b"A" for t, _ in probe)

    def test_unquoted_channel_names_fold_to_lowercase(self, server):
        """PG folds unquoted identifiers: LISTEN Foo + NOTIFY foo
        delivers; quoted names stay case-sensitive (r5 ADVICE)."""

        async def go(srv):
            c = await PgClient.connect(srv.port)
            await c.simple("LISTEN Foo")
            folded = await c.simple("NOTIFY foo")
            await c.simple('LISTEN "Exact"')
            miss = await c.simple("NOTIFY exact")  # folds to 'exact' ≠ 'Exact'
            hit = await c.simple('NOTIFY "Exact"')
            await c.close()
            return folded, miss, hit

        folded, miss, hit = _run(server, go)
        assert any(t == b"A" for t, _ in folded)
        assert not any(t == b"A" for t, _ in miss)
        notes = [b for t, b in hit if t == b"A"]
        assert len(notes) == 1 and notes[0][4:].split(b"\x00")[0] == b"Exact"

    def test_discard_all_unlistens(self, server):
        async def go(srv):
            sub = await PgClient.connect(srv.port)
            pub = await PgClient.connect(srv.port)
            await sub.simple("LISTEN chan_b")
            await sub.simple("DISCARD ALL")
            await pub.simple("NOTIFY chan_b")
            probe = await sub.simple("SELECT 1 AS v")
            await sub.close()
            await pub.close()
            return probe

        probe = _run(server, go)
        assert not any(t == b"A" for t, _ in probe)


class TestMaintenanceNoops:
    """PG maintenance statements (VACUUM / bare ANALYZE / CHECKPOINT /
    REINDEX) have nothing to do on Spark — they must complete as no-ops
    with their PG command tags (maintenance scripts and ORMs issue
    them), while Spark's own ANALYZE TABLE/TABLES still passes through
    and executes for real."""

    def test_classify_maint_forms(self):
        for sql, tag in (
            ("VACUUM", "VACUUM"),
            ("VACUUM lineitem", "VACUUM"),
            ("VACUUM (FULL, ANALYZE) lineitem", "VACUUM"),
            ("vacuum analyze lineitem", "VACUUM"),
            ("ANALYZE", "ANALYZE"),
            ("ANALYZE lineitem", "ANALYZE"),
            ("ANALYSE lineitem", "ANALYZE"),
            ("CHECKPOINT", "CHECKPOINT"),
            ("REINDEX TABLE lineitem", "REINDEX"),
        ):
            st = classify_statement(sql)
            assert st.cls is StatementClass.MAINT, sql
            assert st.tag == tag, sql
        # Spark's real statistics statements are NOT intercepted
        assert (
            classify_statement("ANALYZE TABLE t COMPUTE STATISTICS").cls
            is StatementClass.QUERY
        )
        assert (
            classify_statement("ANALYZE TABLES COMPUTE STATISTICS").cls
            is StatementClass.QUERY
        )

    def test_maint_noops_over_wire(self, server):
        async def go(srv):
            c = await PgClient.connect(srv.port)
            out = {}
            for sql in ("VACUUM lineitem", "ANALYZE lineitem",
                        "CHECKPOINT", "REINDEX TABLE lineitem"):
                msgs = await c.simple(sql)
                assert not any(t == b"E" for t, _ in msgs), sql
                out[sql] = completes_of(msgs)
            # the session still works afterwards
            msgs = await c.simple("SELECT count(*) AS n FROM lineitem")
            rows = rows_of(msgs)
            await c.close()
            return out, rows

        out, rows = _run(server, go)
        assert out["VACUUM lineitem"] == ["VACUUM"]
        assert out["ANALYZE lineitem"] == ["ANALYZE"]
        assert out["CHECKPOINT"] == ["CHECKPOINT"]
        assert out["REINDEX TABLE lineitem"] == ["REINDEX"]
        assert len(rows) == 1
