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


class TestPsqlMetaCommandBattery:
    """r10: the wider describe-command battery — every command here
    used to fail on a missing catalog column/table/function or an
    unhandled dialect form (qualified cast type names, string-literal
    ::regclass, unnest TVF, '{0}' under <>, ARRAY(... ORDER BY 1))."""

    def _ok(self, psql_server, cmd: str) -> str:
        r = psql(psql_server, "-c", cmd)
        assert r.returncode == 0, (cmd, r.stderr)
        assert "ERROR" not in r.stderr, (cmd, r.stderr)
        return r.stdout

    def test_dn_schemas(self, psql_server):
        out = self._ok(psql_server, r"\dn")
        assert "spark" in out and "spark-user" in out

    def test_du_roles(self, psql_server):
        out = self._ok(psql_server, r"\du")
        assert "spark-user" in out and "Superuser" in out

    def test_da_aggregates_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\da")

    def test_dT_types(self, psql_server):
        # r11: builtin types moved to pg_catalog's namespace (pg_dump
        # must not see them as user objects), so plain \dT is empty —
        # exactly like real PG on a fresh database — and \dTS lists
        # the system types
        out = self._ok(psql_server, r"\dTS")
        assert "int4" in out and "varchar" in out

    def test_db_tablespaces(self, psql_server):
        out = self._ok(psql_server, r"\db")
        assert "pg_default" in out and "pg_global" in out

    def test_dx_extensions_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\dx")

    def test_l_plus_sizes(self, psql_server):
        out = self._ok(psql_server, r"\l+")
        assert "0 bytes" in out and "pg_default" in out

    def test_dp_privileges(self, psql_server):
        out = self._ok(psql_server, r"\dp")
        assert "orders" in out and "Policies" in out

    def test_d_plus_storage(self, psql_server):
        out = self._ok(psql_server, r"\d+ orders")
        assert "o_orderkey" in out
        assert "plain" in out and "extended" in out  # attstorage rendering

    def test_sf_function_def(self, psql_server):
        out = self._ok(psql_server, r"\sf version")
        assert "not stored" in out

    # ---- r10 second wave: the exotic describe commands --------------

    def test_dC_casts_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\dC")

    def test_dL_languages_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\dL")

    def test_do_operators_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\do +")

    def test_dO_collations_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\dO")

    def test_dF_ts_configs_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\dF")

    def test_dD_domains_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\dD")

    def test_dd_descriptions_empty(self, psql_server):
        assert "0 rows" in self._ok(psql_server, r"\dd orders")

    def test_drds_settings_empty(self, psql_server):
        # psql prints the "Did not find any settings." notice on stderr
        r = psql(psql_server, "-c", r"\drds")
        assert r.returncode == 0 and "ERROR" not in r.stderr, r.stderr
        assert "Did not find any settings" in (r.stdout + r.stderr)

    def test_dconfig_setting(self, psql_server):
        out = self._ok(psql_server, r"\dconfig statement_timeout")
        assert "statement_timeout" in out


class TestPsqlScrollCursor:
    def test_fetch_backward_over_psql(self, psql_server):
        # one simple-query message with the whole scroll battery, the
        # way psql -c ships it
        out = psql(psql_server, "-At", "-c",
                   "BEGIN; "
                   "DECLARE sc SCROLL CURSOR FOR "
                   "SELECT r_regionkey FROM region ORDER BY r_regionkey; "
                   "FETCH 3 FROM sc; "
                   "FETCH PRIOR FROM sc; "
                   "FETCH BACKWARD 2 FROM sc; "
                   "FETCH LAST FROM sc; "
                   "MOVE ABSOLUTE 2 IN sc; "
                   "FETCH RELATIVE 0 FROM sc; "
                   "CLOSE sc")
        assert out.returncode == 0, out.stderr
        # psql -At interleaves command tags (BEGIN/DECLARE CURSOR/MOVE 1)
        # with the fetched rows — compare the numeric row stream:
        # 0,1,2 | prior→1 | backward→0 (then before-first) | last→4 |
        # relative 0 after MOVE ABSOLUTE 2 → 1
        rows = [ln for ln in out.stdout.splitlines() if ln.isdigit()]
        assert rows == ["0", "1", "2", "1", "0", "4", "1"]
        assert "MOVE 1" in out.stdout

    def test_no_scroll_backward_error(self, psql_server):
        out = psql(psql_server, "-At", "-c",
                   "DECLARE ns CURSOR FOR SELECT 1; FETCH PRIOR FROM ns")
        assert "scan forward" in out.stderr


class TestPgIsReady:
    """The real pg_isready binary with its STOCK 3-second timeout —
    only passes because the handshake goes out before the deferred
    per-connection session init (r11)."""

    def test_pg_isready_default_timeout(self, psql_server):
        out = subprocess.run(
            ["pg_isready", "-h", "127.0.0.1", "-p", str(psql_server.port),
             "-U", "tester", "-d", "default"],
            capture_output=True,
            text=True,
            timeout=30,
        )
        assert out.returncode == 0, out.stdout + out.stderr
        assert "accepting connections" in out.stdout
