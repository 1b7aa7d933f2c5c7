"""Concurrent-session stress: N clients issuing interleaved work over
one server must all see correct, isolated results (the reference's
multi-connection PgJdbcSuite scenarios, concentrated)."""

from __future__ import annotations

import asyncio

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE
from tests.test_protocol_e2e import PgClient, rows_of

N_CLIENTS = 8


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


class TestConcurrentSessions:
    def test_parallel_aggregates_all_correct(self, server):
        srv, loop = server

        async def one(i: int):
            c = await PgClient.connect(srv.port)
            msgs = await c.simple(
                f"SELECT {i} AS tag, count(*) AS n FROM lineitem "
                f"WHERE l_quantity > {i % 5}"
            )
            rows = rows_of(msgs)
            await c.close()
            return i, rows

        async def go():
            return await asyncio.gather(*(one(i) for i in range(N_CLIENTS)))

        results = loop.run_until_complete(go())
        assert len(results) == N_CLIENTS
        # every client got its own tag back with a sane count
        for i, rows in results:
            assert len(rows) == 1
            assert rows[0][0] == str(i).encode()
            assert int(rows[0][1]) > 0
        # identical predicates agree across sessions
        by_pred = {}
        for i, rows in results:
            by_pred.setdefault(i % 5, set()).add(rows[0][1])
        assert all(len(v) == 1 for v in by_pred.values())

    def test_session_conf_isolation_under_concurrency(self, server):
        srv, loop = server

        async def one(i: int):
            c = await PgClient.connect(srv.port)
            await c.simple(f"SET spark.sql.shuffle.partitions = {i + 2}")
            # interleave with real work so sessions overlap in time
            await c.simple("SELECT count(*) FROM nation")
            msgs = await c.simple("SET spark.sql.shuffle.partitions")
            rows = rows_of(msgs)
            await c.close()
            return i, rows

        async def go():
            return await asyncio.gather(*(one(i) for i in range(N_CLIENTS)))

        for i, rows in loop.run_until_complete(go()):
            assert rows[0][1] == str(i + 2).encode(), (i, rows)

    def test_mixed_protocol_and_errors_dont_poison_neighbors(self, server):
        srv, loop = server

        async def good(i: int):
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("SELECT n_name FROM nation ORDER BY "
                                  "n_nationkey LIMIT 1")
            rows = rows_of(msgs)
            await c.close()
            return rows

        async def bad(i: int):
            c = await PgClient.connect(srv.port)
            msgs = await c.simple("SELECT * FROM table_that_does_not_exist")
            has_err = any(t == b"E" for t, _ in msgs)
            # session must still be usable after its own error
            msgs2 = await c.simple("SELECT 1 AS ok")
            rows = rows_of(msgs2)
            await c.close()
            return has_err, rows

        async def go():
            goods = [good(i) for i in range(4)]
            bads = [bad(i) for i in range(4)]
            return await asyncio.gather(*goods, *bads)

        out = loop.run_until_complete(go())
        for rows in out[:4]:
            assert rows == [[b"NATION_0"]]
        for has_err, rows in out[4:]:
            assert has_err and rows == [[b"1"]]
