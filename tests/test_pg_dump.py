"""End-to-end tests with the real pg_dump binary (PostgreSQL 15).

Beyond-reference surface: the reference services psql and the pgjdbc
metadata queries (``catalog.scala:284-379``); pg_dump walks a much
larger slice of pg_catalog — every object-class relation (types,
operators, casts, languages, FDWs, text-search objects, policies, …),
``tableoid`` on every row, the ``OPERATOR(pg_catalog.=)`` spelling,
``set_config``/``LOCK TABLE``/``SET TRANSACTION`` session setup, and
COPY with schema-qualified names + column lists for the data phase.
A successful ``pg_dump`` of the server is the strongest available
evidence that the catalog emulation is coherent end to end.
"""

from __future__ import annotations

import asyncio
import shutil
import subprocess
import threading

import pytest

from spark_sql_server_spark.protocol.server import SparkPGServer
from spark_sql_server_spark.session import register_tables
from tests.conftest import SF_SMOKE

pg_dump_missing = shutil.which("pg_dump") is None
pytestmark = pytest.mark.skipif(
    pg_dump_missing, reason="pg_dump binary not available"
)


@pytest.fixture(scope="module")
def dump_server(spark):
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


def pg_dump(srv, *args: str, timeout: int = 240) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["pg_dump", "-h", "127.0.0.1", "-p", str(srv.port), "-U", "tester",
         "-d", "default", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
    )


class TestSchemaDump:
    def test_schema_only_dump_succeeds(self, dump_server):
        out = pg_dump(dump_server, "-s")
        assert out.returncode == 0, out.stderr
        # every registered table appears as a CREATE TABLE in the
        # 'spark' schema with PG type names
        for t in ("region", "nation", "customer", "orders", "lineitem",
                  "supplier", "part", "events", "documents", "embeddings"):
            assert f"CREATE TABLE spark.{t} (" in out.stdout, t
        assert "CREATE SCHEMA spark;" in out.stdout
        assert "int8" in out.stdout and "float8" in out.stdout
        assert "timestamp" in out.stdout
        # no builtin objects leak into the dump: types live in
        # pg_catalog's namespace, system functions too
        assert "CREATE TYPE" not in out.stdout
        assert "CREATE FUNCTION" not in out.stdout

    def test_single_table_dump_with_data(self, dump_server):
        out = pg_dump(dump_server, "-t", "spark.region")
        assert out.returncode == 0, out.stderr
        assert "COPY spark.region (r_regionkey, r_name) FROM stdin;" in out.stdout
        body = out.stdout.split("FROM stdin;", 1)[1]
        rows = body.split("\\.", 1)[0].strip().splitlines()
        assert len(rows) == 5  # the 5 TPC-H regions
        assert any(r.split("\t") == ["0", "AFRICA"] for r in rows)

    def test_full_dump_with_data(self, dump_server):
        out = pg_dump(dump_server)
        assert out.returncode == 0, out.stderr
        # one COPY block per table
        assert out.stdout.count("FROM stdin;") == 10

    def test_custom_format_dump(self, dump_server):
        # -Fc exercises the same catalog walk through a different writer
        out = subprocess.run(
            ["pg_dump", "-h", "127.0.0.1", "-p", str(dump_server.port),
             "-U", "tester", "-d", "default", "-s", "-Fc"],
            capture_output=True,
            timeout=240,
        )
        assert out.returncode == 0, out.stderr[-500:]
        assert out.stdout[:5] == b"PGDMP"  # custom-format magic


class TestDumpRestoreRoundTrip:
    def test_table_round_trips_through_dump(self, dump_server, spark, tmp_path):
        """CREATE over the wire → pg_dump -t → DROP → psql -f restore
        (ON_ERROR_STOP) → identical data. Exercises ALTER … OWNER TO as
        a no-op, CREATE SCHEMA spark as a no-op (the namespace fiction
        already provides it), the spark.-qualifier strip on DDL/COPY
        targets, and COPY FROM STDIN."""
        psql_base = ["psql", "-h", "127.0.0.1", "-p", str(dump_server.port),
                     "-U", "tester", "-d", "default", "-X", "-At"]

        def run(*args, **kw):
            out = subprocess.run(
                [*psql_base, *args], capture_output=True, text=True,
                timeout=240, **kw,
            )
            assert out.returncode == 0, out.stderr
            return out

        try:
            run("-c", "CREATE TABLE rt_demo (id int8, name text)")
            run("-c", "INSERT INTO rt_demo VALUES (1, 'a'), (2, 'b''q'), "
                      "(3, NULL)")
            dump = pg_dump(dump_server, "-t", "spark.rt_demo")
            assert dump.returncode == 0, dump.stderr
            f = tmp_path / "rt.sql"
            f.write_text(dump.stdout)
            run("-c", "DROP TABLE rt_demo")
            run("-v", "ON_ERROR_STOP=1", "-f", str(f))
            out = run("-c", "SELECT id, name FROM rt_demo ORDER BY id")
            assert out.stdout.splitlines() == ["1|a", "2|b'q", "3|"]
        finally:
            spark.sql("DROP TABLE IF EXISTS rt_demo")


class TestPgDumpall:
    def test_globals_only(self, dump_server):
        out = subprocess.run(
            ["pg_dumpall", "-h", "127.0.0.1", "-p", str(dump_server.port),
             "-U", "tester", "-l", "default", "--globals-only"],
            capture_output=True,
            text=True,
            timeout=240,
        )
        assert out.returncode == 0, out.stderr
        assert 'CREATE ROLE "spark-user";' in out.stdout
        assert "WITH SUPERUSER" in out.stdout  # pg_authid flags rendered

    def test_full_cluster_dump(self, dump_server):
        # connects to every row of pg_database in turn and dumps each
        out = subprocess.run(
            ["pg_dumpall", "-h", "127.0.0.1", "-p", str(dump_server.port),
             "-U", "tester", "-l", "default"],
            capture_output=True,
            text=True,
            timeout=420,
        )
        assert out.returncode == 0, out.stderr
        assert "CREATE TABLE" in out.stdout


class TestInsertsDumpAndQualifiers:
    def test_inserts_dump(self, dump_server):
        # --inserts fetches through DECLARE … CURSOR FOR SELECT … FROM
        # ONLY spark.region — the ONLY inheritance qualifier and the
        # FROM-position schema strip both rewrite
        out = pg_dump(dump_server, "-t", "spark.region", "--inserts",
                      "--rows-per-insert=2")
        assert out.returncode == 0, out.stderr
        assert "INSERT INTO spark.region VALUES" in out.stdout
        assert "(0, 'AFRICA')" in out.stdout

    def test_schema_qualified_select_over_wire(self, dump_server):
        # users type what \d shows them: spark.orders resolves (the
        # nspname fiction — schema 'spark' IS Spark's default database)
        out = subprocess.run(
            ["psql", "-h", "127.0.0.1", "-p", str(dump_server.port),
             "-U", "tester", "-d", "default", "-X", "-At", "-c",
             "SELECT count(*) FROM spark.region JOIN spark.nation "
             "ON r_regionkey = n_regionkey"],
            capture_output=True, text=True, timeout=120,
        )
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip() == "25"
