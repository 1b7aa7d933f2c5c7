"""End-to-end tests with the real psql binary — the reference's primary
client (PsqlCommandsSuite parity: \\l, \\d, \\d table run against the
pg_catalog emulation)."""

from __future__ import annotations

import asyncio
import shutil
import subprocess
import threading

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE

psql_missing = shutil.which("psql") is None
pytestmark = pytest.mark.skipif(psql_missing, reason="psql binary not available")


@pytest.fixture(scope="module")
def psql_server(spark):
    loop = asyncio.new_event_loop()
    thread = threading.Thread(target=loop.run_forever, daemon=True)
    thread.start()

    async def make():
        srv = SparkPGServer(
            spark, port=0, init_session=lambda s: register_tables(s, SF_SMOKE)
        )
        await srv.start()
        return srv

    srv = asyncio.run_coroutine_threadsafe(make(), loop).result(120)
    yield srv
    asyncio.run_coroutine_threadsafe(srv.stop(), loop).result(30)
    loop.call_soon_threadsafe(loop.stop)


def psql(srv, *args: str, timeout: int = 120) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["psql", "-h", "127.0.0.1", "-p", str(srv.port), "-U", "tester",
         "-d", "default", "-X", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
    )


class TestPsqlQueries:
    def test_select(self, psql_server):
        out = psql(psql_server, "-At", "-c",
                   "SELECT o_orderpriority, count(*) FROM orders GROUP BY 1 ORDER BY 1")
        assert out.returncode == 0, out.stderr
        lines = out.stdout.strip().splitlines()
        assert len(lines) == 5
        assert lines[0].startswith("1-URGENT|")

    def test_dialect(self, psql_server):
        out = psql(psql_server, "-At", "-c",
                   "SELECT r::int8 FROM generate_series(1,3) AS s(r) WHERE 'abc' ~ 'a.c'")
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip().splitlines() == ["1", "2", "3"]

    def test_multi_statement(self, psql_server):
        out = psql(psql_server, "-At", "-c", "BEGIN; SELECT 1; SELECT 2")
        assert out.returncode == 0, out.stderr
        assert "1" in out.stdout and "2" in out.stdout

    def test_copy_csv(self, psql_server):
        out = psql(psql_server, "-c",
                   "COPY (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 2 "
                   "ORDER BY 1) TO STDOUT WITH (FORMAT CSV)")
        assert out.returncode == 0, out.stderr
        assert out.stdout == "0,NATION_0\n1,NATION_1\n"

    def test_error_reported(self, psql_server):
        out = psql(psql_server, "-c", "SELECT nope FROM nowhere")
        assert out.returncode != 0
        assert "ERROR" in out.stderr


class TestPsqlMetaCommands:
    def test_list_databases(self, psql_server):
        out = psql(psql_server, "-c", "\\l")
        assert out.returncode == 0, out.stderr
        assert "default" in out.stdout
        assert "pg_catalog" in out.stdout

    def test_list_relations(self, psql_server):
        out = psql(psql_server, "-c", "\\d")
        assert out.returncode == 0, out.stderr
        for t in ("orders", "lineitem", "nation"):
            assert t in out.stdout

    def test_describe_table(self, psql_server):
        out = psql(psql_server, "-c", "\\d orders")
        assert out.returncode == 0, out.stderr
        assert "o_orderkey" in out.stdout
        assert "int8" in out.stdout
        assert "timestamp" in out.stdout

    def test_list_functions(self, psql_server):
        out = psql(psql_server, "-c", "\\df array_upper")
        assert out.returncode == 0, out.stderr
        assert "array_upper" in out.stdout


class TestPsqlSessionStatements:
    """The statement surface added in r4-late, driven by real psql."""

    def test_show_settings(self, psql_server):
        out = psql(psql_server, "-At", "-c", "SHOW server_version")
        assert out.returncode == 0 and out.stdout.strip() == "9.6.0"
        out = psql(psql_server, "-At", "-c", "SHOW TRANSACTION ISOLATION LEVEL")
        assert out.stdout.strip() == "read committed"

    def test_prepare_execute_deallocate(self, psql_server):
        out = psql(
            psql_server, "-At",
            "-c", "PREPARE pq AS SELECT n_name FROM nation WHERE n_nationkey = $1",
            "-c", "EXECUTE pq(2)",
            "-c", "DEALLOCATE pq",
        )
        assert out.returncode == 0, out.stderr
        assert "NATION_2" in out.stdout

    def test_copy_custom_delimiter(self, psql_server):
        out = psql(
            psql_server, "-c",
            "COPY (SELECT r_regionkey, r_name FROM region ORDER BY 1) "
            "TO STDOUT WITH (FORMAT CSV, DELIMITER ';', HEADER)",
        )
        assert out.returncode == 0, out.stderr
        lines = out.stdout.strip().splitlines()
        assert lines[0] == "r_regionkey;r_name"
        assert lines[1] == "0;AFRICA"

    def test_pg_settings_view(self, psql_server):
        out = psql(
            psql_server, "-At", "-c",
            "SELECT setting FROM pg_catalog.pg_settings WHERE name = 'timezone'",
        )
        assert out.returncode == 0 and out.stdout.strip() == "UTC"
