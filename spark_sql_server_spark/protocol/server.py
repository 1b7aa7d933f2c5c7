"""asyncio PostgreSQL V3 server embedding a PySpark driver.

Python re-expression of the reference's Netty frontend + session layer
(SURVEY.md §2.A1-A13, §2.A26-A28):

* one shared SparkSession; each client connection gets
  ``spark.newSession()`` — the reference's default *multi-session* mode
  (shared SparkContext & cache, isolated conf/temp views/UDFs,
  ``SparkSQLServiceManager.scala:112-117``);
* simple ('Q') and extended ('P'/'B'/'D'/'E'/'C'/'S'/'H'/'X') query
  protocols, portals with client-paced fetching (``maxRows`` →
  ``PortalSuspended``, ``protocol.scala:431-504``);
* out-of-band CancelRequest → ``cancelJobGroup``
  (``protocol.scala:1168-1184``, ``ExecutorImpl.scala:68-84``);
* incremental collect: results stream partition-at-a-time through
  ``toLocalIterator`` so driver memory is bounded by one partition,
  not the result set (``ExecutorImpl.scala:185-215``) — the setting
  that matters at 100 TB;
* the PG dialect rewriter and BEGIN/SET interception in front of
  ``spark.sql`` (SURVEY.md §2.A16-A23).

Blocking Spark calls run in worker threads (``asyncio.to_thread``); the
Spark job group is (re)set inside the same thread that triggers the
job, so cancellation targets exactly the cancelling session's work.
"""

from __future__ import annotations

import asyncio
import itertools
import time
import logging
import re
import secrets
import struct
from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

from spark_sql_server_spark.dialect.commands import (
    StatementClass,
    classify_statement,
    count_placeholders,
    split_statements,
    split_top_level_commas,
    substitute_params,
)
from spark_sql_server_spark.dialect.rewriter import rewrite_sql
from spark_sql_server_spark.protocol import messages as M
from spark_sql_server_spark.protocol.encoders import (
    BINARY_CAPABLE,
    RowSerializer,
)
from spark_sql_server_spark.protocol.params import decode_param
from spark_sql_server_spark.protocol.pgtypes import UNSPECIFIED_OID, VARCHAR, pg_type_for

log = logging.getLogger(__name__)


class ScrollBufferLimit(Exception):
    """SCROLL cursor driver-side buffer crossed its hard bound.

    PG materializes SCROLL cursors into a tuplestore that spills to
    disk; this server bounds the in-memory buffer instead and answers
    PG's ``54000 program_limit_exceeded``."""

    sqlstate = "54000"

_COMMAND_KEYWORDS = {
    "CREATE", "DROP", "ALTER", "INSERT", "TRUNCATE", "USE", "CACHE",
    "UNCACHE", "CLEAR", "ANALYZE", "MSCK", "REFRESH", "ADD", "LOAD",
    # side-effecting DML: spark.sql() executes these eagerly, so Parse
    # must defer analysis to Execute or a Parse+Describe with no Execute
    # would already mutate data on a v2/Delta catalog
    "DELETE", "UPDATE", "MERGE",
}

FETCH_BATCH = 4096  # rows pulled+encoded per executor hop (one write each)

# PG COPY text-format escapes (COPY TO writes these; COPY FROM decodes)
_COPY_ESCAPES = {
    "\\": "\\", "t": "\t", "n": "\n", "r": "\r",
    "b": "\b", "f": "\f", "v": "\v",
}


def _copy_unescape(v: str) -> str:
    """Single left-to-right pass — chained str.replace corrupts input
    like ``\\\\t`` (escaped backslash + literal t)."""
    if "\\" not in v:
        return v
    out = []
    i, n = 0, len(v)
    while i < n:
        c = v[i]
        if c == "\\" and i + 1 < n:
            out.append(_COPY_ESCAPES.get(v[i + 1], v[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _split_copy_fields(line: str, sep: str) -> list[str]:
    """Split a COPY text-format line on the delimiter, honoring
    backslash escapes (a custom delimiter appears escaped as ``\\<sep>``
    inside field data; the default tab is escaped as the letter ``\\t``,
    for which this degrades to a plain split)."""
    out: list[str] = []
    buf: list[str] = []
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == "\\" and i + 1 < n:
            buf.append(c)
            buf.append(line[i + 1])
            i += 2
            continue
        if c == sep:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    out.append("".join(buf))
    return out


def _csv_copy_rows(text: str, delim: str = ",") -> list[list]:
    """Parse a PG CSV COPY payload: configurable delimiter, '\"' quote doubled to
    escape. Unlike csv.reader, keeps quoting info so an unquoted empty
    field decodes to NULL while a quoted empty string stays ''."""
    rows: list[list] = []
    rec: list = []
    buf: list[str] = []
    in_quotes = False
    was_quoted = False
    started = False

    def end_field():
        nonlocal was_quoted
        v = "".join(buf)
        rec.append(v if (v or was_quoted) else None)
        buf.clear()
        was_quoted = False

    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if in_quotes:
            if c == '"':
                if i + 1 < n and text[i + 1] == '"':
                    buf.append('"')
                    i += 1
                else:
                    in_quotes = False
            else:
                buf.append(c)
        elif c == '"':
            in_quotes = True
            was_quoted = True
            started = True
        elif c == delim:
            end_field()
            started = True
        elif c in ("\n", "\r"):
            if c == "\r" and i + 1 < n and text[i + 1] == "\n":
                i += 1
            if started or rec:
                end_field()
                rows.append(list(rec))
                rec.clear()
            started = False
        else:
            buf.append(c)
            started = True
        i += 1
    if started or rec:
        end_field()
        rows.append(list(rec))
    return rows


@dataclass
class PreparedStatement:
    name: str
    raw_sql: str
    sql: str  # dialect-rewritten, $n → :pN
    param_oids: list[int]
    stmt: Any  # classified Statement
    df: DataFrame | None = None  # analyzed (schema) when SELECT-ish & param-free
    #: resolved SQL the cached df was analyzed from — a SQL-level
    #: EXECUTE's target can be DEALLOCATEd and re-PREPAREd with
    #: different SQL between Describe and Execute, so the cache must
    #: key on the resolution, not just the statement identity
    df_resolved_sql: str | None = None


@dataclass
class Portal:
    name: str
    statement: PreparedStatement
    df: DataFrame | None
    result_formats: list[int]
    serializer: RowSerializer | None = None
    iterator: Iterator | None = None
    fetched: int = 0
    exhausted: bool = False
    is_cursor: bool = False  # named portal → cursor-paced fetch
    # monitoring-ring bookkeeping: a maxRows fetch loop (JDBC
    # setFetchSize) is ONE statement — record it once, timed from the
    # first Execute, not one ring entry per PortalSuspended resume
    first_execute_t0: float | None = None
    # decoded Bind parameters for emulated UPDATE/DELETE (the DML
    # rewrite re-runs spark.sql with these; pgbench -M extended/
    # prepared sends its TPC-B statements this way)
    bound_args: dict | None = None
    suspended: bool = False
    # SCROLL cursors buffer fetched-so-far rows driver-side (like PG's
    # own SCROLL materialization caveat) so PRIOR/BACKWARD/ABSOLUTE can
    # revisit them; pos is PG's cursor position: 0 = before first row,
    # 1..N on row N, N+1 = after last; total stays None until the
    # source iterator is exhausted
    scroll: bool = False
    buffer: list | None = None
    pos: int = 0
    total: int | None = None


@dataclass
class ServerMetrics:
    """Counters the reference surfaces in its UI tab (SQLServerListener)
    — here a plain struct, logged and queryable by the embedder."""

    connections_opened: int = 0
    statements_executed: int = 0
    rows_sent: int = 0
    errors: int = 0
    cancels: int = 0

    def __post_init__(self) -> None:
        # bounded ring of recently finished statements — the statement
        # table the reference renders in its UI tab
        # (SQLServerListener's ExecutionInfo); O(1) append, never a
        # Spark job, safe on the hot path
        from collections import deque

        self.recent_statements: Any = deque(maxlen=100)

    def record_statement(
        self, pid: int, sql: str, started: float, state: str
    ) -> None:
        self.recent_statements.append(
            {
                "pid": pid,
                "query": sql[:300],
                "started": round(started, 3),
                "duration_ms": int((time.time() - started) * 1000),
                "state": state,
            }
        )

    def snapshot(self) -> dict[str, int]:
        return {
            "connections_opened": self.connections_opened,
            "statements_executed": self.statements_executed,
            "rows_sent": self.rows_sent,
            "errors": self.errors,
            "cancels": self.cancels,
        }


@dataclass
class SessionState:
    pid: int
    secret: int
    session: SparkSession
    params: dict[str, str]
    statements: dict[str, PreparedStatement] = field(default_factory=dict)
    portals: dict[str, Portal] = field(default_factory=dict)
    in_error: bool = False  # extended-protocol error: skip until Sync
    last_activity: float = 0.0
    writer: Any = None
    reader: Any = None  # for COPY FROM STDIN sub-protocol reads
    #: SQL-level cursors (DECLARE/FETCH/CLOSE) — name → Portal
    cursors: dict[str, Portal] = field(default_factory=dict)
    #: SQL-level PREPARE name AS ... — name → raw PG-dialect query text
    #: ($n placeholders substituted with argument expressions at EXECUTE)
    #: SQL-level PREPARE name → (query text, expected parameter count)
    sql_prepared: dict[str, tuple[str, int]] = field(default_factory=dict)
    #: every key this session SET (including the pool/incremental
    #: specials) — what RESET ALL / DISCARD ALL undo
    set_overrides: set[str] = field(default_factory=set)
    #: PG statement_timeout in ms (0 = disabled) — enforced around every
    #: blocking Spark phase via cancelJobGroup
    statement_timeout_ms: int = 0
    #: channels this session LISTENs on (NOTIFY fan-out targets)
    listen_channels: set[str] = field(default_factory=set)
    #: temp views present after session init (registered tables +
    #: pg_stat_* live views) — DISCARD ALL/TEMP drops only views
    #: created after this snapshot
    boot_temp_views: set[str] = field(default_factory=set)
    #: fair-scheduler pool (SET spark.sql.server.pool) — applied in the
    #: worker thread that runs each statement, because Spark local
    #: properties are per-thread
    scheduler_pool: str | None = None
    #: per-session incremental-collect override (reference conf
    #: spark.sql.server.incrementalCollect.enabled); None → server default
    incremental_collect: bool | None = None
    #: monitoring (pg_stat_activity): wall-clock connect time + the
    #: query currently/last running in this session
    backend_start: float = 0.0
    current_query: str | None = None
    #: deferred session init (runs behind the handshake so the auth
    #: round-trip is instant); the first dispatch awaits it
    init_task: object | None = None

    @property
    def job_group(self) -> str:
        return f"pg-session-{self.pid}"


class SparkPGServer:
    def __init__(
        self,
        spark: SparkSession,
        host: str = "127.0.0.1",
        port: int = 5432,
        incremental_collect: bool = True,
        init_session=None,
        pg_catalog: bool = True,
        idle_session_timeout: float = 0.0,
        ssl_cert: str | None = None,
        ssl_key: str | None = None,
        ssl_self_signed: bool = False,
        auth: str = "trust",
        tx_noop: bool = False,  # COMMIT/ROLLBACK answer like PG outside
        # a transaction (WARNING + tag) instead of the reference's
        # rejection — pgbench and BEGIN…COMMIT-wrapping loaders need it
        password_check=None,  # callback(user, password) -> bool
        password_lookup=None,  # callback(user) -> cleartext password | None
        scram_iterations: int | None = None,
        execution_mode: str | None = None,
        binary_transfer: bool | None = None,
        metrics_port: int | None = None,
        metrics_host: str | None = None,
        copy_in_batch_bytes: int = 32 << 20,
        scroll_buffer_max_rows: int = 1_000_000,
    ):
        self.spark = spark
        self.host = host
        self.port = port
        self.incremental_collect = incremental_collect
        # SCROLL cursors buffer fetched-so-far rows driver-side; real PG
        # materializes SCROLL cursors into a tuplestore that spills to
        # disk — here the buffer is bounded and crossing it raises PG's
        # 54000 program_limit_exceeded instead of OOMing the driver
        # (r11 VERDICT task 5)
        self.scroll_buffer_max_rows = scroll_buffer_max_rows
        # COPY FROM STDIN spills to a parquet staging dir once the
        # driver-side row buffer exceeds this bound (bulk loads must
        # not scale driver RSS with payload size)
        self.copy_in_batch_bytes = copy_in_batch_bytes
        # peak COPY-IN buffer observed (bytes) — bounded-memory gauge
        # for tests and the /metrics endpoint
        self.last_copy_in_peak_buffer = 0
        # reference confs (SQLServerConf.scala:69-72,165): constructor
        # args win, else the shared session's conf, else the defaults
        # (multi-session isolation, binary transfer allowed)
        if execution_mode is None:
            execution_mode = self._conf("spark.sql.server.executionMode", "multi-session")
        if execution_mode not in ("multi-session", "single-session"):
            raise ValueError(
                f"unsupported executionMode {execution_mode!r} "
                "(multi-session | single-session; the reference's multi-context "
                "mode is Livy-based and disabled for Spark 3+ upstream)"
            )
        self.execution_mode = execution_mode
        if binary_transfer is None:
            binary_transfer = (
                self._conf("spark.sql.server.binaryTransferMode", "true").lower() == "true"
            )
        self.binary_transfer = binary_transfer
        self.init_session = init_session  # callback(SparkSession) per connection
        self.pg_catalog = pg_catalog
        self.idle_session_timeout = idle_session_timeout
        if auth not in ("trust", "password", "md5", "scram-sha-256"):
            raise ValueError(f"unsupported auth mode {auth!r}")
        self.auth = auth
        self.tx_noop = tx_noop
        self.password_check = password_check
        # SCRAM derives the verifier per-exchange from the cleartext
        # password the embedder supplies (PG stores salted verifiers in
        # pg_authid; a plain password source keeps the embedder API small)
        self.password_lookup = password_lookup
        self.scram_iterations = scram_iterations
        self.metrics = ServerMetrics()
        #: HTTP monitoring endpoint (reference SQLServerListener + UI
        #: tab equivalent); None → disabled, 0 → ephemeral port.
        #: Binds loopback by default — the endpoint is unauthenticated
        #: and exposes usernames / application names / live SQL text,
        #: so it must NOT silently inherit a 0.0.0.0 PG bind; widening
        #: requires the explicit metrics_host / --metrics-host opt-in.
        self.metrics_port = metrics_port
        self.metrics_host = metrics_host or "127.0.0.1"
        self.metrics_server = None
        self._reaper_task: asyncio.Task | None = None
        self._ssl_ctx = None
        if ssl_self_signed and not ssl_cert:
            from spark_sql_server_spark.protocol.tls import generate_self_signed_cert

            ssl_cert, ssl_key = generate_self_signed_cert()
        #: RFC 5929 tls-server-end-point data (hash of our certificate)
        #: — the SCRAM-SHA-256-PLUS channel-binding anchor, advertised
        #: only on TLS connections
        self._scram_cbind_data: bytes | None = None
        if ssl_cert and ssl_key:
            from spark_sql_server_spark.protocol.tls import server_ssl_context

            self._ssl_ctx = server_ssl_context(ssl_cert, ssl_key)
            try:
                from spark_sql_server_spark.protocol import scram as _scram

                with open(ssl_cert, "rb") as f:
                    self._scram_cbind_data = _scram.tls_server_end_point(
                        f.read()
                    )
            except Exception:  # noqa: BLE001 — cert unparsable for
                # binding (e.g. exotic signature algo): plain SCRAM
                # stays available, -PLUS simply isn't advertised
                log.warning(
                    "could not derive tls-server-end-point binding; "
                    "SCRAM-SHA-256-PLUS disabled", exc_info=True
                )
        self._sessions: dict[int, SessionState] = {}
        self._pid_counter = itertools.count(1)
        self._server: asyncio.AbstractServer | None = None
        # runtime-catalog refresh cache (see _init in _startup): bumped
        # on every catalog-mutating command so the next connection's
        # refresh sees a fresh fingerprint
        self._catalog_epoch = 0
        self._catalog_refresh_token: tuple | None = None

    def _note_catalog_mutation(self, sql: str) -> None:
        """Invalidate the runtime-catalog refresh cache after DDL."""
        head = (sql or "").lstrip().split(None, 1)
        if head and head[0].upper() in ("CREATE", "DROP", "ALTER"):
            self._catalog_epoch += 1

    def _conf(self, key: str, default: str) -> str:
        try:
            return self.spark.conf.get(key, default)
        except Exception:
            return default

    # ------------------------------------------------------------------ #
    # lifecycle

    async def start(self) -> None:
        import time

        self._started_at = time.time()
        if self.pg_catalog:
            from spark_sql_server_spark.catalog import init_pg_catalog

            await asyncio.to_thread(init_pg_catalog, self.spark)
        self._server = await asyncio.start_server(self._handle_conn, self.host, self.port)
        addr = self._server.sockets[0].getsockname()
        self.port = addr[1]
        if self.idle_session_timeout > 0:
            self._reaper_task = asyncio.create_task(self._reap_idle_sessions())
        if self.metrics_port is not None:
            from spark_sql_server_spark.protocol.http_metrics import MetricsHTTPServer

            self.metrics_server = MetricsHTTPServer(
                self, self.metrics_host, self.metrics_port
            )
            await self.metrics_server.start()
        log.info("SparkPGServer listening on %s:%s", *addr[:2])

    async def stop(self) -> None:
        if self.metrics_server:
            await self.metrics_server.stop()
            self.metrics_server = None
        if self._reaper_task:
            self._reaper_task.cancel()
        if self._server:
            self._server.close()
            await self._server.wait_closed()

    async def _reap_idle_sessions(self) -> None:
        """Close sessions idle past the timeout — the reference's
        idle-session reaper thread (SparkSQLServiceManager.scala:223-254)."""
        import time

        while True:
            await asyncio.sleep(max(self.idle_session_timeout / 2, 0.05))
            cutoff = time.monotonic() - self.idle_session_timeout
            for state in list(self._sessions.values()):
                if state.last_activity and state.last_activity < cutoff:
                    log.info("reaping idle session %s", state.pid)
                    self._sessions.pop(state.pid, None)
                    if state.writer is not None:
                        state.writer.close()

    # ------------------------------------------------------------------ #
    # connection handling

    async def _handle_conn(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        state: SessionState | None = None
        try:
            state = await self._startup(reader, writer)
            if state is None:
                return
            while True:
                hdr = await reader.readexactly(5)
                tag = hdr[:1]
                (length,) = struct.unpack("!i", hdr[1:5])
                if length < 4 or length > (1 << 30):
                    # PG's PqRecvBuf bound: a malformed/hostile length
                    # is a protocol violation, never an allocation
                    writer.write(
                        M.error_response(
                            f"invalid message length {length} "
                            f"(tag {tag!r})",
                            "08P01",
                            severity="FATAL",
                        )
                    )
                    await writer.drain()
                    break
                body = await reader.readexactly(length - 4) if length > 4 else b""
                if tag == b"X":  # Terminate
                    break
                await self._dispatch(state, tag, body, writer)
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        except asyncio.CancelledError:
            pass  # server shutdown while the connection was open
        except Exception:  # pragma: no cover — defensive
            log.exception("connection handler failed")
        finally:
            if state is not None:
                self._sessions.pop(state.pid, None)
                # a health-check probe (pg_isready) disconnects before
                # its first statement: reap the deferred init task so
                # the loop never tears down around a pending task
                task = state.init_task
                if task is not None and not task.done():
                    try:
                        await task
                    except Exception:  # noqa: BLE001 — init failed; conn is gone
                        pass
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:
                pass

    async def _startup(self, reader, writer) -> SessionState | None:
        while True:
            hdr = await reader.readexactly(4)
            (length,) = struct.unpack("!i", hdr)
            # PG bounds the startup packet (MAX_STARTUP_PACKET_LENGTH
            # 10000) — reject before allocating an attacker-chosen
            # buffer; a negative/short length is equally malformed
            if length < 8 or length > 10000:
                writer.write(
                    M.error_response(
                        f"invalid startup packet length {length}",
                        "08P01",
                        severity="FATAL",
                    )
                )
                await writer.drain()
                writer.close()
                return None
            body = await reader.readexactly(length - 4)
            (code,) = struct.unpack("!i", body[:4])
            if code == M.SSL_REQUEST_CODE:
                if self._ssl_ctx is not None:
                    writer.write(b"S")
                    await writer.drain()
                    await writer.start_tls(self._ssl_ctx)
                else:
                    writer.write(b"N")
                    await writer.drain()
                continue
            if code == M.GSSENC_REQUEST_CODE:
                writer.write(b"N")  # GSS encryption unsupported (reference stubs GSS too)
                await writer.drain()
                continue
            if code == M.CANCEL_REQUEST_CODE:
                pid, secret = M.parse_cancel(body[4:])
                self._cancel(pid, secret)
                writer.close()
                return None
            startup = M.parse_startup(body)
            break

        if self.auth == "password":
            writer.write(M.authentication_cleartext_password())
            await writer.drain()
            msg = await self._read_auth_message(reader, writer)
            if msg is None:
                return None
            hdr1, pbody = msg
            if hdr1 != b"p":
                writer.write(M.error_response("expected PasswordMessage", "28000"))
                await writer.drain()
                writer.close()
                return None
            password = pbody.rstrip(b"\x00").decode("utf-8")
            user = startup.params.get("user", "")
            ok = self.password_check(user, password) if self.password_check else False
            if not ok:
                writer.write(
                    M.error_response(
                        f'password authentication failed for user "{user}"', "28P01",
                        severity="FATAL",
                    )
                )
                await writer.drain()
                writer.close()
                return None
        elif self.auth == "md5":
            if not await self._md5_handshake(startup, reader, writer):
                return None
        elif self.auth == "scram-sha-256":
            if not await self._scram_handshake(startup, reader, writer):
                return None

        pid = next(self._pid_counter)
        self.metrics.connections_opened += 1
        state = SessionState(
            pid=pid,
            secret=secrets.randbits(31),
            # single-session mode (reference SQLServerConf.scala:69-72):
            # every connection shares one SparkSession, so temp views and
            # SET confs are visible across clients; default multi-session
            # isolates each connection via newSession()
            session=(
                self.spark
                if self.execution_mode == "single-session"
                else self.spark.newSession()
            ),
            params=startup.params,
        )
        def _init(sess: SparkSession) -> list:
            if self.pg_catalog:
                from spark_sql_server_spark.catalog import init_system_functions

                init_system_functions(sess)  # per-session, like PgSessionInitializer
            if self.init_session is not None:
                self.init_session(sess)
            listed: list = []
            try:
                listed = sess.catalog.listTables()
            except Exception:  # noqa: BLE001
                listed = []
            if self.pg_catalog:
                # sync pg_class/pg_attribute with this session's views so
                # psql \d works (the reference leaves its runtime catalog
                # tables empty — a TODO in catalog.scala).
                # r13 (optimization): the rewrite (3 TRUNCATE+insert
                # parquet writes + a listColumns RPC per table — measured
                # 3.2 s) used to run on EVERY connection, yet every
                # connection of a server derives the identical content
                # unless catalog-mutating DDL ran in between: registered
                # tables are fixed per server and client temp views are
                # session-local (they were never visible to a later
                # connection's listTables anyway). Skip when the
                # (DDL-epoch, table-list) fingerprint matches the last
                # refresh — any CREATE/DROP/ALTER over the wire bumps the
                # epoch, so \d sees new objects exactly as before.
                try:
                    from spark_sql_server_spark.catalog import refresh_runtime_catalog

                    token = (
                        self._catalog_epoch,
                        tuple(
                            sorted(
                                (t.name, t.tableType, bool(t.isTemporary))
                                for t in listed
                            )
                        ),
                    )
                    if token != self._catalog_refresh_token:
                        refresh_runtime_catalog(sess)
                        self._catalog_refresh_token = token
                except Exception:
                    log.debug("runtime catalog refresh failed", exc_info=True)
            return listed

        def _init_all() -> None:
            listed = _init(state.session)
            # snapshot the boot-time temp views (registered tables,
            # pg_stat_* live views) so DISCARD ALL/TEMP only drops
            # client-created ones (reuses the init listing — no second
            # listTables RPC)
            try:
                state.boot_temp_views = {
                    t.name
                    for t in listed
                    if t.tableType == "TEMPORARY" and t.namespace == []
                }
            except Exception:  # noqa: BLE001
                state.boot_temp_views = set()

        import time

        state.backend_start = time.time()
        state.last_activity = time.monotonic()
        state.writer = writer
        state.reader = reader
        self._sessions[pid] = state
        # Session init (system functions + table registration + runtime
        # catalog refresh) takes seconds; run it behind the handshake so
        # AuthenticationOk/ReadyForQuery go out immediately — health
        # checks with stock timeouts (pg_isready's 3 s) and poolers
        # measuring connect latency see a normal PG. The first dispatch
        # awaits the task before touching the session.
        state.init_task = asyncio.create_task(asyncio.to_thread(_init_all))
        # a client that disconnects before its first statement leaves the
        # task unawaited — retrieve the exception so the loop stays quiet
        state.init_task.add_done_callback(
            lambda t: t.exception() if not t.cancelled() else None
        )

        try:
            # reference conf: spark.sql.server.version (psql tailors its
            # metadata SQL to this)
            server_version = self.spark.conf.get("spark.sql.server.version", "9.6.0")
        except Exception:
            server_version = "9.6.0"
        out = bytearray()
        out += M.authentication_ok()
        for k, v in (
            ("server_version", server_version),
            ("server_encoding", "UTF8"),
            ("client_encoding", "UTF8"),
            ("application_name", startup.params.get("application_name", "")),
            ("DateStyle", "ISO"),
            ("integer_datetimes", "on"),
            ("TimeZone", "UTC"),
            ("standard_conforming_strings", "on"),
        ):
            out += M.parameter_status(k, v)
        out += M.backend_key_data(pid, state.secret)
        out += M.ready_for_query()
        writer.write(bytes(out))
        await writer.drain()
        return state

    #: auth-token bound (PG's pg_hba token limit class): the handshake
    #: reads before authentication must not let an anonymous client
    #: buffer ~2 GB via a hostile length word (r11 ADVICE) — mirror the
    #: post-auth 1<<30 bound with a much tighter pre-auth cap
    _MAX_AUTH_MSG = 65536

    async def _read_auth_message(
        self, reader, writer
    ) -> tuple[bytes, bytes] | None:
        """Read one framed message during the auth handshake with the
        length word bounded to ``4 <= plen <= 65536``. On violation:
        FATAL 08P01 (protocol_violation), close, return ``None``."""
        hdr = await reader.readexactly(5)
        (plen,) = struct.unpack("!i", hdr[1:5])
        if not 4 <= plen <= self._MAX_AUTH_MSG:
            writer.write(
                M.error_response(
                    f"invalid message length {plen} during authentication",
                    "08P01",
                    severity="FATAL",
                )
            )
            await writer.drain()
            writer.close()
            return None
        body = await reader.readexactly(plen - 4)
        return hdr[:1], body

    async def _md5_handshake(self, startup, reader, writer) -> bool:
        """MD5 challenge-response (PG `md5` hba method): the client sends
        ``'md5' + hex(md5(hex(md5(password + user)) + salt))`` for a
        4-byte random salt. Needs the cleartext password server-side
        (``password_lookup``), like SCRAM. Beyond-reference — the
        reference only stubs GSS (``protocol.scala:703-729``)."""
        import hashlib

        user = startup.params.get("user", "")
        salt = secrets.token_bytes(4)

        async def fail(msg: str, sqlstate: str) -> bool:
            writer.write(M.error_response(msg, sqlstate, severity="FATAL"))
            await writer.drain()
            writer.close()
            return False

        writer.write(M.authentication_md5_password(salt))
        await writer.drain()
        msg = await self._read_auth_message(reader, writer)
        if msg is None:
            return False
        tag, body = msg
        if tag != b"p":
            return await fail("expected PasswordMessage", "28000")
        got = body.rstrip(b"\x00")
        pw = self.password_lookup(user) if self.password_lookup else None
        # unknown user still burns the same two hashes against a random
        # password so the timing doesn't leak which usernames exist
        secret = pw if pw is not None else secrets.token_hex(16)
        inner = hashlib.md5((secret + user).encode("utf-8")).hexdigest()
        want = b"md5" + hashlib.md5(inner.encode("ascii") + salt).hexdigest().encode(
            "ascii"
        )
        if pw is None or not secrets.compare_digest(got, want):
            return await fail(
                f'password authentication failed for user "{user}"', "28P01"
            )
        return True

    async def _scram_handshake(self, startup, reader, writer) -> bool:
        """SCRAM-SHA-256 SASL exchange (RFC 5802/7677; beyond-reference —
        the reference only stubs GSS, ``protocol.scala:703-729``).
        Returns True on success; on failure writes the error, closes the
        transport and returns False."""
        from spark_sql_server_spark.protocol import scram

        user = startup.params.get("user", "")
        pw = self.password_lookup(user) if self.password_lookup else None
        # -PLUS is advertised only when this connection already
        # upgraded to TLS and we could derive the cert binding (RFC
        # 5802: the mechanism list is per-connection)
        tls_active = writer.get_extra_info("ssl_object") is not None
        offer_plus = tls_active and self._scram_cbind_data is not None
        # unknown user: run a mock exchange against a random password so
        # the timing/shape doesn't leak which usernames exist (PG's
        # mock_scram_secret behavior); the proof then fails as 28P01
        srv = scram.ScramServer(
            pw if pw is not None else secrets.token_hex(16),
            iterations=self.scram_iterations or scram.DEFAULT_ITERATIONS,
            cbind_data=None,  # set after the client picks a mechanism
            plus_advertised=offer_plus,
        )

        async def fail(msg: str, sqlstate: str) -> bool:
            writer.write(M.error_response(msg, sqlstate, severity="FATAL"))
            await writer.drain()
            writer.close()
            return False

        async def read_password_message() -> bytes | None:
            msg = await self._read_auth_message(reader, writer)
            if msg is None:
                raise ConnectionResetError("auth message length violation")
            tag, body = msg
            return body if tag == b"p" else None

        mechanisms = (
            [scram.MECHANISM_PLUS, scram.MECHANISM]
            if offer_plus
            else [scram.MECHANISM]
        )
        writer.write(M.authentication_sasl(mechanisms))
        await writer.drain()

        # SASLInitialResponse: mechanism cstring + int32 length + data
        body = await read_password_message()
        if body is None:
            return await fail("expected SASLInitialResponse", "28000")
        try:
            mech, rest = body.split(b"\x00", 1)
            (dlen,) = struct.unpack("!i", rest[:4])
            first = rest[4 : 4 + dlen] if dlen >= 0 else b""
        except (ValueError, struct.error):
            return await fail("malformed SASLInitialResponse", "08P01")
        chosen = mech.decode("utf-8", "replace")
        if chosen not in mechanisms:
            return await fail(
                f"unsupported SASL mechanism {mech!r} "
                f"(server offers {', '.join(mechanisms)})",
                "28000",
            )
        if chosen == scram.MECHANISM_PLUS:
            # channel binding is in play: the client-final c= attribute
            # must carry the hash of OUR certificate
            srv._cbind_data = self._scram_cbind_data
        try:
            server_first = srv.handle_client_first(first)
        except scram.ScramError as e:
            return await fail(str(e), e.sqlstate)
        if chosen == scram.MECHANISM_PLUS and not srv._cbind_used:
            # selecting -PLUS commits the client to a p= gs2 header
            return await fail(
                "SCRAM-SHA-256-PLUS selected without a channel-binding "
                "gs2 header", "28000",
            )
        writer.write(M.authentication_sasl_continue(server_first))
        await writer.drain()

        # SASLResponse: raw client-final-message
        body = await read_password_message()
        if body is None:
            return await fail("expected SASLResponse", "28000")
        try:
            server_final = srv.handle_client_final(body)
        except scram.ScramError as e:
            if e.sqlstate == "28P01" or pw is None:
                return await fail(
                    "password authentication failed for user "
                    f'"{user}"',
                    "28P01",
                )
            return await fail(str(e), e.sqlstate)
        if pw is None:
            # mock exchange somehow passed (cannot happen: random secret)
            return await fail(
                f'password authentication failed for user "{user}"', "28P01"
            )
        writer.write(M.authentication_sasl_final(server_final))
        await writer.drain()
        return True

    def _cancel(self, pid: int, secret: int) -> None:
        state = self._sessions.get(pid)
        if state is not None and state.secret == secret:
            self.metrics.cancels += 1
            self.spark.sparkContext.cancelJobGroup(state.job_group)
            log.info("cancelled job group %s", state.job_group)

    # ------------------------------------------------------------------ #
    # message dispatch

    async def _dispatch(self, state, tag, body, writer) -> None:
        import time

        state.last_activity = time.monotonic()
        if state.init_task is not None:
            task, state.init_task = state.init_task, None
            await task  # deferred session init — must finish before any
            # statement touches the session (failure closes the
            # connection via the handler's defensive except)
        if state.in_error and tag not in (b"S",):
            return  # skip until Sync (extended-protocol error recovery)
        try:
            if tag == b"Q":
                await self._on_query(state, M.parse_query(body), writer)
            elif tag == b"P":
                await self._on_parse(state, M.parse_parse(body), writer)
            elif tag == b"B":
                await self._on_bind(state, M.parse_bind(body), writer)
            elif tag == b"D":
                await self._on_describe(state, M.parse_describe(body), writer)
            elif tag == b"E":
                await self._on_execute(state, M.parse_execute(body), writer)
            elif tag == b"C":
                await self._on_close(state, M.parse_close(body), writer)
            elif tag == b"S":
                state.in_error = False
                writer.write(M.ready_for_query())
                await writer.drain()
            elif tag == b"H":  # Flush
                await writer.drain()
            elif tag in (b"F", b"d", b"c", b"f"):
                raise NotImplementedError(
                    f"message type {tag!r} not supported"
                )  # FunctionCall / COPY — same as reference (protocol.scala:506-535)
            else:
                raise ValueError(f"unknown frontend message {tag!r}")
        except Exception as e:  # noqa: BLE001 — every error becomes ErrorResponse
            log.debug("statement failed", exc_info=True)
            self.metrics.errors += 1
            writer.write(M.error_response(_errmsg(e), _sqlstate_for(e)))
            if tag == b"Q":
                writer.write(M.ready_for_query())
            else:
                state.in_error = True
            await writer.drain()

    # ------------------------------------------------------------------ #
    # simple query protocol

    async def _on_query(self, state, raw: str, writer) -> None:
        statements = split_statements(raw)
        if not statements:
            writer.write(M.empty_query_response())
            writer.write(M.ready_for_query())
            await writer.drain()
            return
        for stmt_sql in statements:
            t0 = time.time()
            try:
                await self._run_simple(state, stmt_sql, writer)
                self.metrics.record_statement(state.pid, stmt_sql, t0, "finished")
            except Exception as e:  # noqa: BLE001
                log.debug("query failed: %s", stmt_sql, exc_info=True)
                self.metrics.errors += 1
                self.metrics.record_statement(state.pid, stmt_sql, t0, "failed")
                writer.write(M.error_response(_errmsg(e), _sqlstate_for(e)))
                break
        writer.write(M.ready_for_query())
        await writer.drain()

    async def _run_simple(self, state, sql: str, writer) -> None:
        self.metrics.statements_executed += 1
        stmt = classify_statement(sql)
        if stmt.cls is StatementClass.EMPTY:
            writer.write(M.empty_query_response())
            return
        if stmt.cls is StatementClass.BEGIN:
            writer.write(M.command_complete("BEGIN"))
            return
        if stmt.cls is StatementClass.MAINT:
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.UPDATE_DELETE:
            tag = await self._run_dml(state, stmt)
            writer.write(M.command_complete(tag))
            return
        if stmt.cls in (StatementClass.COMMIT, StatementClass.ROLLBACK):
            if self.tx_noop:
                # BEGIN is a no-op, so no transaction is ever in
                # progress — answer exactly like real PG outside a
                # transaction: WARNING + the command tag. Every write
                # already autocommitted, so COMMIT truly has nothing to
                # do (and ROLLBACK truly cannot undo — the warning is
                # the honest signal). Opt-in: default stays the
                # reference's rejection (protocol.scala:605-608).
                writer.write(
                    M.notice_response(
                        "there is no transaction in progress", "WARNING"
                    )
                )
                writer.write(M.command_complete(stmt.tag))
                return
            raise ValueError(f"Operation not allowed: {stmt.sql.strip()}")
        if stmt.cls is StatementClass.DEALLOCATE:
            # PG: DEALLOCATE name drops one prepared statement (SQL-level
            # or protocol-level share the namespace); ALL drops every one
            self._deallocate(state, stmt)
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.PREPARE:
            self._sql_prepare(state, stmt)
            writer.write(M.command_complete("PREPARE"))
            return
        if stmt.cls is StatementClass.EXECUTE_STMT:
            resolved = self._resolve_execute(state, stmt)
            df = await self._spark_sql(state, rewrite_sql(resolved))
            if not df.schema.fields:
                self._note_catalog_mutation(resolved)
                writer.write(M.command_complete(_tag_for(resolved, df=df)))
                return
            await self._stream_result(
                state, df, [0], writer, limit=0, tag_word=None, sql=resolved
            )
            return
        if stmt.cls is StatementClass.SET:
            key, val = stmt.set_kv
            self._apply_set(state, key, val)
            writer.write(M.command_complete("SET"))
            return
        if stmt.cls is StatementClass.SHOW_GUC:
            self._show_guc(state, stmt.cursor_name, writer)
            return
        if stmt.cls is StatementClass.RESET:
            self._reset_guc(state, stmt.cursor_name)
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.DISCARD:
            self._discard(state, stmt.cursor_name)
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.SET_CONFIG:
            # SET spelled as a SELECTable function; echoes the new value
            key, val = stmt.set_kv
            self._apply_set(state, key, val)
            writer.write(M.row_description([("set_config", 25, -1, 0)]))
            writer.write(M.data_row([val.encode()]))
            writer.write(M.command_complete("SELECT 1"))
            return
        if stmt.cls is StatementClass.BACKEND_CTL:
            writer.write(M.row_description(self._backend_ctl_fields(stmt.copy_query)))
            writer.write(M.data_row(self._backend_ctl(state, stmt)))
            writer.write(M.command_complete("SELECT 1"))
            return
        if stmt.cls is StatementClass.LISTEN:
            state.listen_channels.add(stmt.cursor_name)
            writer.write(M.command_complete("LISTEN"))
            return
        if stmt.cls is StatementClass.UNLISTEN:
            if stmt.cursor_name == "*":
                state.listen_channels.clear()
            else:
                state.listen_channels.discard(stmt.cursor_name)
            writer.write(M.command_complete("UNLISTEN"))
            return
        if stmt.cls is StatementClass.NOTIFY:
            self._notify(state, stmt.cursor_name, stmt.copy_query or "")
            writer.write(M.command_complete("NOTIFY"))
            return
        if stmt.cls is StatementClass.SHOW_SET:
            # `SET` → all conf, `SET key` → that key (Spark handles both)
            df = await self._spark_sql(state, stmt.sql)
            await self._stream_result(state, df, [0], writer, limit=0, tag_word="SET")
            return
        if stmt.cls is StatementClass.COPY_OUT:
            await self._copy_out(state, stmt, writer)
            return
        if stmt.cls is StatementClass.COPY_IN:
            await self._copy_in(state, stmt, writer)
            return
        if stmt.cls is StatementClass.DECLARE_CURSOR:
            df = await self._spark_sql(state, rewrite_sql(stmt.copy_query))
            state.cursors[stmt.cursor_name] = Portal(
                name=stmt.cursor_name,
                statement=None,
                df=df,
                result_formats=[0],
                serializer=self._make_serializer(df, [0]),
                is_cursor=True,
                scroll=stmt.cursor_scroll,
                buffer=[] if stmt.cursor_scroll else None,
            )
            writer.write(M.command_complete("DECLARE CURSOR"))
            return
        if stmt.cls is StatementClass.FETCH:
            cur = state.cursors.get(stmt.cursor_name)
            if cur is None:
                raise ValueError(f'cursor "{stmt.cursor_name}" does not exist')
            if cur.scroll:
                await self._fetch_scroll(state, stmt, cur, writer)
                return
            direction = stmt.fetch_direction
            if stmt.fetch_move or direction not in (
                None, "NEXT", "FORWARD", "ALL", "FORWARD ALL",
            ) or (stmt.fetch_count or 0) < 0:
                # PG: backward fetch on a NO SCROLL cursor is 55000
                raise ValueError(
                    "cursor can only scan forward "
                    "(declare it with SCROLL to fetch backwards)"
                )
            limit = stmt.fetch_count or 0
            if direction == "NEXT" or (
                direction == "FORWARD" and stmt.fetch_count is None
            ):
                limit = 1
            await self._stream_result(
                state,
                cur.df,
                cur.result_formats,
                writer,
                limit=limit,
                portal=cur,
                tag_word="FETCH",
                sql=stmt.sql,
                send_row_description=True,
            )
            return
        if stmt.cls is StatementClass.CLOSE_CURSOR:
            if stmt.cursor_name.upper() == "ALL":
                state.cursors.clear()
            elif state.cursors.pop(stmt.cursor_name, None) is None:
                raise ValueError(f'cursor "{stmt.cursor_name}" does not exist')
            writer.write(M.command_complete("CLOSE CURSOR"))
            return
        df = await self._spark_sql(state, rewrite_sql(sql))
        if not df.schema.fields:
            if not await self._stream_zero_columns(state, df, writer, sql):
                self._note_catalog_mutation(sql)
                writer.write(M.command_complete(_tag_for(sql, df=df)))
            return
        await self._stream_result(state, df, [0], writer, limit=0, tag_word=None, sql=sql)

    async def _stream_zero_columns(self, state, df, writer, sql) -> bool:
        """A genuine ZERO-COLUMN query result — PG's ``SELECT FROM t``,
        or a ``quotedRegexColumnNames`` projection matching no columns —
        arrives from Spark with an empty schema, the same shape as a
        command (DDL/INSERT) that has no result set at all. Commands
        keep their tags; a statement whose first word is a query verb
        gets the faithful PG wire shape instead: RowDescription with 0
        fields, one empty DataRow per row, ``SELECT n`` (psql prints
        '(n rows)'). Returns False when the statement is not a query."""
        head = (sql or "").lstrip().split(None, 1)
        if (head[0].upper() if head else "") not in (
            "SELECT", "WITH", "VALUES", "TABLE",
        ):
            return False
        n = int(await self._to_thread_with_timeout(state, df.count))
        writer.write(M.row_description([]))
        row = M.data_row([])
        for start in range(0, n, 5000):
            writer.write(row * min(5000, n - start))
            await writer.drain()
        writer.write(M.command_complete(f"SELECT {n}"))
        return True

    async def _fetch_scroll(self, state, stmt, cur, writer) -> None:
        """FETCH/MOVE on a ``DECLARE SCROLL CURSOR`` — PG's full
        direction grammar (NEXT/PRIOR/FIRST/LAST/ABSOLUTE n/RELATIVE n/
        FORWARD [n|ALL]/BACKWARD [n|ALL]). Rows already pulled from the
        source stay buffered driver-side so the cursor can revisit them
        (PG's own SCROLL materialization caveat); the source iterator is
        only advanced as far as the fetch requires, so FETCH 10 on a
        SCROLL cursor over a huge result still reads ~10 rows."""
        if cur.iterator is None:
            def start():
                sc = state.session.sparkContext
                sc.setJobGroup(
                    state.job_group, (stmt.sql or "")[:200], interruptOnCancel=True
                )
                sc.setLocalProperty("spark.scheduler.pool", state.scheduler_pool)
                if self._incremental(state):
                    return cur.df.toLocalIterator(prefetchPartitions=True)
                return iter(cur.df.collect())

            cur.iterator = await self._to_thread_with_timeout(state, start)

        def pull(upto: int | None) -> None:
            # extend the buffer to `upto` rows (None → exhaust source)
            while cur.total is None and (
                upto is None or len(cur.buffer) < upto
            ):
                if len(cur.buffer) >= self.scroll_buffer_max_rows:
                    # real PG spills SCROLL tuplestores to disk; here
                    # the driver-side buffer is hard-bounded — fail
                    # with PG's program_limit_exceeded class rather
                    # than OOM (the cursor stays usable over the rows
                    # already buffered)
                    raise ScrollBufferLimit(
                        "SCROLL cursor buffer limit of "
                        f"{self.scroll_buffer_max_rows} rows exceeded; "
                        "declare the cursor NO SCROLL for streaming "
                        "fetches or raise scroll_buffer_max_rows"
                    )
                batch = list(itertools.islice(cur.iterator, 1000))
                cur.buffer.extend(batch)
                if len(batch) < 1000:
                    cur.total = len(cur.buffer)

        async def ensure(upto: int | None) -> None:
            if cur.total is None and (upto is None or len(cur.buffer) < upto):
                await self._to_thread_with_timeout(state, lambda: pull(upto))

        direction, n = stmt.fetch_direction, stmt.fetch_count
        # normalize the grammar to (mode, count); count None = ALL
        if direction in (None, "FORWARD"):
            if n is None:
                # bare `FETCH c` keeps the legacy drain-everything
                # semantics of the non-scroll path; bare FORWARD is 1
                mode, cnt = ("forward", None if direction is None else 1)
            else:
                mode, cnt = ("forward", n) if n >= 0 else ("backward", -n)
        elif direction in ("ALL", "FORWARD ALL"):
            mode, cnt = "forward", None
        elif direction == "NEXT":
            mode, cnt = "forward", 1
        elif direction == "PRIOR":
            mode, cnt = "backward", 1
        elif direction == "BACKWARD":
            if n is None:
                mode, cnt = "backward", 1
            else:
                mode, cnt = ("backward", n) if n >= 0 else ("forward", -n)
        elif direction == "BACKWARD ALL":
            mode, cnt = "backward", None
        elif direction == "FIRST":
            mode, cnt = "absolute", 1
        elif direction == "LAST":
            mode, cnt = "absolute", -1
        elif direction in ("ABSOLUTE", "RELATIVE"):
            if n is None:
                raise ValueError(f"{direction} requires a row count")
            mode, cnt = direction.lower(), n
        else:  # pragma: no cover — the regex can't produce others
            raise ValueError(f"unsupported FETCH direction {direction!r}")

        pos = cur.pos
        rows: list = []
        if mode == "forward" and cnt == 0 or mode == "relative" and cnt == 0:
            # FORWARD 0 / RELATIVE 0: re-fetch the current row
            if pos >= 1:
                await ensure(pos)
                if cur.total is None or pos <= cur.total:
                    rows = [cur.buffer[pos - 1]]
            newpos = pos
        elif mode == "forward":
            await ensure(None if cnt is None else pos + cnt)
            end = len(cur.buffer) if cnt is None else min(
                pos + cnt, len(cur.buffer)
            )
            rows = cur.buffer[pos:end]
            newpos = (
                pos + cnt
                if cnt is not None and len(rows) == cnt
                else cur.total + 1
            )
        elif mode == "backward":
            lo = 1 if cnt is None else max(pos - cnt, 1)
            rows = list(reversed(cur.buffer[lo - 1 : max(pos - 1, 0)]))
            newpos = (
                pos - cnt if cnt is not None and len(rows) == cnt else 0
            )
        elif mode == "absolute":
            if cnt == 0:
                newpos = 0
            elif cnt > 0:
                await ensure(cnt)
                if cur.total is not None and cnt > cur.total:
                    newpos = cur.total + 1
                else:
                    rows, newpos = [cur.buffer[cnt - 1]], cnt
            else:
                await ensure(None)
                k = cur.total + cnt + 1
                if k >= 1:
                    rows, newpos = [cur.buffer[k - 1]], k
                else:
                    newpos = 0
        else:  # relative, cnt != 0
            target = pos + cnt
            if target < 1:
                newpos = 0
            else:
                await ensure(target)
                if cur.total is not None and target > cur.total:
                    newpos = cur.total + 1
                else:
                    rows, newpos = [cur.buffer[target - 1]], target

        cur.pos = newpos
        cur.fetched += len(rows)
        if stmt.fetch_move:
            writer.write(M.command_complete(f"MOVE {len(rows)}"))
            await writer.drain()
            return
        writer.write(self._row_description(cur.df, cur.result_formats))
        if rows:
            blob = await asyncio.to_thread(
                cur.serializer.serialize_rows_batch, rows
            )
            writer.write(blob)
            self.metrics.rows_sent += len(rows)
        writer.write(M.command_complete(f"FETCH {len(rows)}"))
        await writer.drain()

    def _guc_values(self, state) -> dict[str, str]:
        """The settings PG advertises via ParameterStatus (shared
        defaults in ``catalog.pg_catalog.GUC_DEFAULTS``, also the
        pg_settings view), overlaid with per-session values."""
        from spark_sql_server_spark.catalog.pg_catalog import GUC_DEFAULTS

        gucs = dict(GUC_DEFAULTS)
        try:
            gucs["server_version"] = self.spark.conf.get(
                "spark.sql.server.version", gucs["server_version"]
            )
        except Exception:  # noqa: BLE001
            pass
        gucs["application_name"] = state.params.get("application_name", "")
        gucs["session_authorization"] = state.params.get("user", "")
        return gucs

    @staticmethod
    def _sql_prepare(state, stmt) -> None:
        """Register a SQL-level PREPARE (shared by simple + extended)."""
        if (
            stmt.cursor_name in state.sql_prepared
            or stmt.cursor_name in state.statements
        ):
            raise ValueError(
                f'prepared statement "{stmt.cursor_name}" already exists'
            )
        expected = (
            stmt.prepare_nparams
            if stmt.prepare_nparams is not None
            else count_placeholders(stmt.copy_query)
        )
        state.sql_prepared[stmt.cursor_name] = (stmt.copy_query, expected)

    @staticmethod
    def _resolve_execute(state, stmt) -> str:
        """EXECUTE name(args) → the stored query with argument
        expressions spliced into its $n placeholders."""
        entry = state.sql_prepared.get(stmt.cursor_name)
        if entry is None:
            raise ValueError(
                f'prepared statement "{stmt.cursor_name}" does not exist'
            )
        query, expected = entry
        args = (
            split_top_level_commas(stmt.copy_query)
            if stmt.copy_query and stmt.copy_query.strip()
            else []
        )
        if len(args) != expected:
            # PG raises 42601 for both surplus and missing args, even
            # when the query doesn't reference every declared parameter
            raise ValueError(
                f"wrong number of parameters for prepared statement "
                f'"{stmt.cursor_name}": expected {expected}, got {len(args)}'
            )
        return substitute_params(query, args)

    def _deallocate(self, state, stmt) -> None:
        if stmt.cursor_name is None or stmt.cursor_name.upper() == "ALL":
            state.statements.clear()
            state.sql_prepared.clear()
        elif (
            state.sql_prepared.pop(stmt.cursor_name, None) is None
            and state.statements.pop(stmt.cursor_name, None) is None
        ):
            raise ValueError(
                f'prepared statement "{stmt.cursor_name}" does not exist'
            )

    @staticmethod
    def _show_guc_fields(name: str) -> list[tuple[str, int, int, int]]:
        if name.upper() == "ALL":
            return [
                ("name", 25, -1, 0),
                ("setting", 25, -1, 0),
                ("description", 25, -1, 0),
            ]
        return [(name.lower(), 25, -1, 0)]

    def _show_guc_rows(self, state, name: str) -> list[list[bytes]]:
        """Rows for PG ``SHOW <setting>`` / ``SHOW ALL``. SET'd session
        conf wins over the advertised defaults, so SET x / SHOW x
        round-trips; unknown names raise like PG."""
        gucs = self._guc_values(state)
        if name.upper() == "ALL":
            # per-session SET overrides win here too, mirroring the
            # single-setting path (SET x; SHOW ALL must agree with SHOW x)
            rows = []
            for k in sorted(gucs):
                val = gucs[k]
                try:
                    sv = state.session.conf.get(k)
                    if sv is not None:
                        val = str(sv)
                except Exception:  # noqa: BLE001 — not SET in this session
                    pass
                rows.append([k.encode(), val.encode(), b""])
            return rows
        val: str | None = None
        try:
            val = state.session.conf.get(name)
        except Exception:  # noqa: BLE001 — not a Spark conf key
            val = gucs.get(name.lower())
        if val is None:
            raise ValueError(f'unrecognized configuration parameter "{name}"')
        return [[str(val).encode()]]

    def _show_guc(self, state, name: str, writer) -> None:
        rows = self._show_guc_rows(state, name)
        writer.write(M.row_description(self._show_guc_fields(name)))
        for r in rows:
            writer.write(M.data_row(r))
        writer.write(M.command_complete("SHOW"))

    @staticmethod
    def _backend_ctl_fields(kind: str) -> list[tuple[str, int, int, int]]:
        return [(f"pg_{kind}_backend", 16, 1, 0)]  # boolean

    def _backend_ctl(self, state, stmt) -> list[bytes | None]:
        """SELECT pg_cancel_backend(pid) / pg_terminate_backend(pid):
        cancel the target session's running jobs (the CancelRequest
        path, no secret needed server-side — PG allows same-user
        cancels); terminate additionally closes its connection. Returns
        the PG boolean cell: 't' if the pid exists, 'f' otherwise."""
        pid = int(stmt.cursor_name)
        target = self._sessions.get(pid)
        if target is None:
            return [b"f"]
        self.metrics.cancels += 1
        try:
            self.spark.sparkContext.cancelJobGroup(target.job_group)
        except Exception:  # noqa: BLE001 — context already stopped
            pass
        if stmt.copy_query == "terminate" and target.writer is not None:
            try:
                target.writer.close()
            except Exception:  # noqa: BLE001 — already closing
                pass
        return [b"t"]

    def _apply_set(self, state, key: str, val: str) -> None:
        """SET applies to the *session* conf and returns zero rows
        (protocol.scala:626-638). The fair-scheduler pool key maps to
        the sparkContext local property, like ExecutorImpl.scala:139-145."""
        state.set_overrides.add(key)
        if key.lower() == "statement_timeout":
            state.statement_timeout_ms = _parse_timeout_ms(val)
            state.session.conf.set("statement_timeout", val)  # SHOW/RESET flow
            return
        if key in ("spark.sql.server.pool", "spark.scheduler.pool"):
            # can't set the local property here: this runs on the event
            # loop thread, but the JVM-local property must be set on the
            # worker thread that triggers the job (_spark_sql does)
            state.scheduler_pool = val
            return
        if key == "spark.sql.server.incrementalCollect.enabled":
            # per-session toggle, like the reference conf
            # (SQLServerConf.scala:170-174)
            state.incremental_collect = val.lower() in ("true", "1", "on", "yes")
            return
        state.session.conf.set(key, val)

    def _reset_guc(self, state, name: str) -> None:
        """PG RESET <name> / RESET ALL: undo per-session SET overrides.
        Lenient on names that were never SET (pooled clients RESET
        defensively); Spark confs revert via conf.unset (restores the
        default), the pool/incremental specials revert to None."""
        if name.upper() == "ALL":
            for k in list(state.set_overrides):
                self._reset_one(state, k)
            state.set_overrides.clear()
            return
        self._reset_one(state, name)
        state.set_overrides.discard(name)

    def _reset_one(self, state, key: str) -> None:
        if key.lower() == "statement_timeout":
            state.statement_timeout_ms = 0
        if key in ("spark.sql.server.pool", "spark.scheduler.pool"):
            state.scheduler_pool = None
            return
        if key == "spark.sql.server.incrementalCollect.enabled":
            state.incremental_collect = None
            return
        try:
            state.session.conf.unset(key)
        except Exception:  # noqa: BLE001 — non-modifiable/unknown key
            pass

    def _discard(self, state, target: str) -> None:
        """PG DISCARD: ALL = RESET ALL + DEALLOCATE ALL + close every
        cursor and portal — the sequence pgbouncer issues between pooled
        clients. PLANS/SEQUENCES have no analogue here (prepared plans
        ARE the statements, no sequence state). TEMP drops the
        connection's temporary views in multi-session mode (pgbouncer
        keeps ONE wire connection and multiplexes clients over it, so
        per-connection temp state genuinely leaks between pooled
        clients without this — caught by the between-clients scenario
        trace); single-session mode shares one Spark session across
        connections, so dropping there would nuke other clients and
        stays a documented no-op."""
        if target == "TEMP":
            self._discard_temp(state)
            return
        if target != "ALL":
            return
        self._reset_guc(state, "ALL")
        state.sql_prepared.clear()
        state.statements.clear()
        state.portals.clear()
        state.cursors.clear()
        state.listen_channels.clear()  # PG: DISCARD ALL runs UNLISTEN *
        self._discard_temp(state)

    def _discard_temp(self, state) -> None:
        """Drop client-created temporary views (PG DISCARD TEMP) —
        multi-session mode only; the boot-time views (registered tables
        + pg_stat_* live views) are recreated state, not client temp."""
        if self.execution_mode == "single-session":
            return
        boot = state.boot_temp_views
        try:
            current = {
                t.name
                for t in state.session.catalog.listTables()
                if t.tableType == "TEMPORARY" and t.namespace == []
            }
        except Exception:  # noqa: BLE001 — catalog listing best-effort
            return
        for name in current - boot:
            try:
                state.session.catalog.dropTempView(name)
            except Exception:  # noqa: BLE001 — best-effort, but leave a
                # trace so a pooled-client temp-view leak is diagnosable
                log.debug("DISCARD: failed to drop temp view %r", name,
                          exc_info=True)

    def _notify(self, state, channel: str, payload: str) -> None:
        """NOTIFY fan-out: write an 'A' NotificationResponse to every
        session LISTENing on the channel (including the notifier, as PG
        does). Writes queue on each listener's transport and flush from
        the event loop — a PG client sees the notification with its
        next protocol read (psycopg2's poll()/notifies pattern)."""
        for s in self._sessions.values():
            if channel in s.listen_channels and s.writer is not None:
                try:
                    s.writer.write(
                        M.notification_response(state.pid, channel, payload)
                    )
                except Exception:  # noqa: BLE001 — listener disconnecting
                    pass

    # ------------------------------------------------------------------ #
    # extended query protocol

    async def _on_parse(self, state, p: M.ParseMessage, writer) -> None:
        rewritten = rewrite_sql(p.sql)
        stmt = classify_statement(p.sql)
        ps = PreparedStatement(
            name=p.name, raw_sql=p.sql, sql=rewritten, param_oids=p.param_oids, stmt=stmt
        )
        if stmt.cls is StatementClass.QUERY and not _is_command(p.sql):
            if not p.param_oids:
                # analysis only (lazy) — gives Describe('S') its schema.
                # A client may legally Parse a parameterized statement
                # WITHOUT declaring oids (pgjdbc does); analysis then
                # fails with UNBOUND_SQL_PARAMETER — defer to Bind,
                # where the params arrive with UNSPECIFIED oids. Any
                # other analysis error surfaces now, like PG's Parse.
                try:
                    ps.df = await self._spark_sql(state, rewritten)
                except Exception as e:
                    if "UNBOUND_SQL_PARAMETER" not in str(e):
                        raise
                    ps.df = None  # Describe('S') falls back to NoData
            else:
                # parameterized: analyze with NULL-bound params so
                # Describe('S') can return a RowDescription before Bind —
                # the analyzer coerces NullType like the reference's
                # ParameterPlaceHolder trick (predicates.scala:26-34)
                try:
                    null_args = {f"p{i + 1}": None for i in range(len(p.param_oids))}
                    ps.df = await self._spark_sql(state, rewritten, null_args)
                except Exception:
                    ps.df = None  # Describe('S') falls back to NoData
        state.statements[p.name] = ps
        writer.write(M.parse_complete())

    async def _on_bind(self, state, b: M.BindMessage, writer) -> None:
        ps = state.statements.get(b.statement)
        if ps is None:
            raise ValueError(f"unknown prepared statement: {b.statement!r}")
        df = None
        if ps.stmt.cls is StatementClass.QUERY:
            if b.params:
                fmts = b.param_formats or [0] * len(b.params)
                if len(fmts) == 1:
                    fmts = fmts * len(b.params)
                oids = list(ps.param_oids) + [UNSPECIFIED_OID] * (
                    len(b.params) - len(ps.param_oids)
                )
                args = {
                    f"p{i + 1}": decode_param(oids[i], fmts[i], raw)
                    for i, raw in enumerate(b.params)
                }
                df = await self._spark_sql(state, ps.sql, args)
            elif ps.df is not None:
                df = ps.df
            elif not _is_command(ps.raw_sql):
                df = await self._spark_sql(state, ps.sql)
        portal = Portal(
            name=b.portal,
            statement=ps,
            df=df,
            result_formats=b.result_formats,
            is_cursor=bool(b.portal),
        )
        if ps.stmt.cls is StatementClass.UPDATE_DELETE and b.params:
            fmts = b.param_formats or [0] * len(b.params)
            if len(fmts) == 1:
                fmts = fmts * len(b.params)
            oids = list(ps.param_oids) + [UNSPECIFIED_OID] * (
                len(b.params) - len(ps.param_oids)
            )
            portal.bound_args = {
                f"p{i + 1}": decode_param(oids[i], fmts[i], raw)
                for i, raw in enumerate(b.params)
            }
        if df is not None:
            portal.serializer = self._make_serializer(df, b.result_formats)
        state.portals[b.portal] = portal
        writer.write(M.bind_complete())

    def _make_serializer(self, df: DataFrame, result_formats: list[int]) -> RowSerializer:
        n = len(df.schema.fields)
        fmts = result_formats or [0] * n
        if len(fmts) == 1:
            fmts = fmts * n
        # binaryTransferMode=false (reference SQLServerConf.scala:165)
        # downgrades every column to text regardless of the Bind request;
        # otherwise downgrade only types with no binary form
        fmts = [
            f
            if self.binary_transfer and f == 1 and isinstance(fld.dataType, BINARY_CAPABLE)
            else 0
            for f, fld in zip(fmts, df.schema.fields)
        ]
        return RowSerializer(df.schema, fmts)

    async def _on_describe(self, state, d: M.DescribeMessage, writer) -> None:
        if d.kind == "S":
            ps = state.statements.get(d.name)
            if ps is None:
                raise ValueError(f"unknown prepared statement: {d.name!r}")
            oids = [o or VARCHAR.oid for o in ps.param_oids]
            writer.write(M.parameter_description(oids))
            if ps.df is not None:
                writer.write(self._row_description(ps.df, []))
            elif ps.stmt.cls is StatementClass.SHOW_GUC:
                writer.write(
                    M.row_description(self._show_guc_fields(ps.stmt.cursor_name))
                )
            elif ps.stmt.cls is StatementClass.BACKEND_CTL:
                writer.write(
                    M.row_description(self._backend_ctl_fields(ps.stmt.copy_query))
                )
            elif ps.stmt.cls is StatementClass.SET_CONFIG:
                writer.write(M.row_description([("set_config", 25, -1, 0)]))
            elif ps.stmt.cls is StatementClass.EXECUTE_STMT:
                writer.write(
                    self._row_description(
                        await self._describe_execute_df(state, ps), []
                    )
                )
            else:
                writer.write(M.no_data())
        else:
            portal = state.portals.get(d.name)
            if portal is None:
                raise ValueError(f"unknown portal: {d.name!r}")
            if portal.df is not None:
                writer.write(self._row_description(portal.df, portal.result_formats))
            elif portal.statement is not None and (
                portal.statement.stmt.cls is StatementClass.SHOW_GUC
            ):
                writer.write(
                    M.row_description(
                        self._show_guc_fields(portal.statement.stmt.cursor_name)
                    )
                )
            elif portal.statement is not None and (
                portal.statement.stmt.cls is StatementClass.BACKEND_CTL
            ):
                writer.write(
                    M.row_description(
                        self._backend_ctl_fields(portal.statement.stmt.copy_query)
                    )
                )
            elif portal.statement is not None and (
                portal.statement.stmt.cls is StatementClass.SET_CONFIG
            ):
                writer.write(M.row_description([("set_config", 25, -1, 0)]))
            elif portal.statement is not None and (
                portal.statement.stmt.cls is StatementClass.EXECUTE_STMT
            ):
                df = await self._describe_execute_df(state, portal.statement)
                portal.df = df
                portal.serializer = self._make_serializer(df, portal.result_formats)
                writer.write(self._row_description(df, portal.result_formats))
            else:
                writer.write(M.no_data())

    async def _describe_execute_df(self, state, ps) -> DataFrame:
        """Analyze a SQL-level EXECUTE at Describe time so Describe-first
        clients (e.g. a JDBC driver running ``EXECUTE p`` through
        Parse/Describe/Execute) see a RowDescription instead of NoData;
        the DataFrame stays lazy — rows stream at Execute."""
        resolved = self._resolve_execute(state, ps.stmt)
        if ps.df is None or ps.df_resolved_sql != resolved:
            ps.df = await self._spark_sql(state, rewrite_sql(resolved))
            ps.df_resolved_sql = resolved
        return ps.df

    def _row_description(self, df: DataFrame, result_formats: list[int]) -> bytes:
        ser = self._make_serializer(df, result_formats)
        fields = []
        for f, fmt in zip(df.schema.fields, ser.formats):
            pgt = pg_type_for(f.dataType)
            fields.append((f.name, pgt.oid, pgt.len, fmt))
        return M.row_description(fields)

    async def _on_execute(self, state, e: M.ExecuteMessage, writer) -> None:
        portal = state.portals.get(e.portal)
        if portal is None:
            raise ValueError(f"unknown portal: {e.portal!r}")
        ps = portal.statement
        t0 = time.time()
        if portal.first_execute_t0 is None:
            portal.first_execute_t0 = t0
        portal.suspended = False
        try:
            await self._execute_portal(state, e, portal, ps, writer)
            if not portal.suspended:
                self.metrics.record_statement(
                    state.pid, ps.raw_sql, portal.first_execute_t0, "finished"
                )
        except Exception:
            self.metrics.record_statement(
                state.pid, ps.raw_sql, portal.first_execute_t0, "failed"
            )
            raise

    async def _execute_portal(self, state, e, portal, ps, writer) -> None:
        stmt = ps.stmt
        if stmt.cls is StatementClass.BEGIN:
            writer.write(M.command_complete("BEGIN"))
            return
        if stmt.cls is StatementClass.MAINT:
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.UPDATE_DELETE:
            tag = await self._run_dml(state, stmt, portal.bound_args)
            writer.write(M.command_complete(tag))
            return
        if stmt.cls in (StatementClass.COMMIT, StatementClass.ROLLBACK):
            if self.tx_noop:
                writer.write(
                    M.notice_response(
                        "there is no transaction in progress", "WARNING"
                    )
                )
                writer.write(M.command_complete(stmt.tag))
                return
            raise ValueError(f"Operation not allowed: {ps.raw_sql.strip()}")
        if stmt.cls is StatementClass.SET:
            key, val = stmt.set_kv
            self._apply_set(state, key, val)
            writer.write(M.command_complete("SET"))
            return
        if stmt.cls is StatementClass.SHOW_GUC:
            # RowDescription was Describe's job; Execute sends rows only
            for r in self._show_guc_rows(state, stmt.cursor_name):
                writer.write(M.data_row(r))
            writer.write(M.command_complete("SHOW"))
            return
        if stmt.cls is StatementClass.PREPARE:
            self._sql_prepare(state, stmt)
            writer.write(M.command_complete("PREPARE"))
            return
        if stmt.cls is StatementClass.DEALLOCATE:
            self._deallocate(state, stmt)
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.RESET:
            self._reset_guc(state, stmt.cursor_name)
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.DISCARD:
            self._discard(state, stmt.cursor_name)
            writer.write(M.command_complete(stmt.tag))
            return
        if stmt.cls is StatementClass.SET_CONFIG:
            key, val = stmt.set_kv
            self._apply_set(state, key, val)
            writer.write(M.data_row([val.encode()]))
            writer.write(M.command_complete("SELECT 1"))
            return
        if stmt.cls is StatementClass.BACKEND_CTL:
            writer.write(M.data_row(self._backend_ctl(state, stmt)))
            writer.write(M.command_complete("SELECT 1"))
            return
        if stmt.cls is StatementClass.LISTEN:
            state.listen_channels.add(stmt.cursor_name)
            writer.write(M.command_complete("LISTEN"))
            return
        if stmt.cls is StatementClass.UNLISTEN:
            if stmt.cursor_name == "*":
                state.listen_channels.clear()
            else:
                state.listen_channels.discard(stmt.cursor_name)
            writer.write(M.command_complete("UNLISTEN"))
            return
        if stmt.cls is StatementClass.NOTIFY:
            self._notify(state, stmt.cursor_name, stmt.copy_query or "")
            writer.write(M.command_complete("NOTIFY"))
            return
        if stmt.cls is StatementClass.EXECUTE_STMT and portal.df is None:
            # SQL-level EXECUTE through the extended protocol: resolve
            # now and stream through the portal like a deferred command
            resolved = self._resolve_execute(state, stmt)
            df = await self._spark_sql(state, rewrite_sql(resolved))
            if not df.schema.fields:
                self._note_catalog_mutation(resolved)
                writer.write(M.command_complete(_tag_for(resolved, df=df)))
                return
            portal.df = df
            portal.serializer = self._make_serializer(df, portal.result_formats)
        if portal.df is None:
            # deferred command (DDL/INSERT/...): execute now
            df = await self._spark_sql(state, ps.sql)
            if df.schema.fields:
                portal.df = df
                portal.serializer = self._make_serializer(df, portal.result_formats)
            else:
                self._note_catalog_mutation(ps.raw_sql)
                writer.write(M.command_complete(_tag_for(ps.raw_sql, df=df)))
                return
        await self._stream_result(
            state,
            portal.df,
            portal.result_formats,
            writer,
            limit=e.max_rows,
            portal=portal,
            sql=ps.raw_sql,
        )

    async def _on_close(self, state, c: M.CloseMessage, writer) -> None:
        if c.kind == "S":
            state.statements.pop(c.name, None)
        else:
            state.portals.pop(c.name, None)
        writer.write(M.close_complete())

    # ------------------------------------------------------------------ #
    # execution & streaming

    async def _copy_out(self, state, stmt, writer) -> None:
        """COPY (query) TO STDOUT [WITH (FORMAT {TEXT|CSV|BINARY} [, HEADER])].

        Bulk-egress extension (the reference rejects COPY,
        protocol.scala:679-701). Rows stream straight from
        ``toLocalIterator`` into CopyData messages — driver memory stays
        bounded by one partition, the natural bulk-unload path for big
        results that would drown the per-row DataRow protocol. BINARY
        uses the PGCOPY v1 framing (signature header, int16 field count,
        int32-length-prefixed cells, int16 -1 trailer) with the same
        cell encoders as binary DataRows.
        """
        from spark_sql_server_spark.protocol.encoders import (
            binary_encoder,
            text_encoder,
        )

        df = await self._spark_sql(state, rewrite_sql(stmt.copy_query))
        is_csv = stmt.copy_format == "csv"
        is_binary = stmt.copy_format == "binary"

        if is_binary:
            from pyspark.sql import types as T

            def bin_enc(f):
                if isinstance(f.dataType, T.StringType):
                    return lambda v: v.encode("utf-8")
                e = binary_encoder(f.dataType)
                if e is None:
                    raise ValueError(
                        "COPY BINARY does not support column "
                        f"{f.name} of type {f.dataType.simpleString()}"
                    )
                return e

            bencs = [bin_enc(f) for f in df.schema.fields]
            nf = struct.pack("!h", len(bencs))

            def render(row) -> bytes:
                parts = [nf]
                for v, enc in zip(row, bencs):
                    if v is None:
                        parts.append(b"\xff\xff\xff\xff")
                    else:
                        c = enc(v)
                        parts.append(len(c).to_bytes(4, "big") + c)
                return b"".join(parts)

        else:
            encs = [text_encoder(f.dataType) for f in df.schema.fields]
            sep = stmt.copy_delim or ("," if is_csv else "\t")
            null_mark = (
                stmt.copy_null
                if stmt.copy_null is not None
                else ("" if is_csv else "\\N")
            )

            def render(row) -> bytes:
                cells = []
                for v, enc in zip(row, encs):
                    if v is None:
                        cells.append(null_mark)
                        continue
                    s = enc(v)
                    if is_csv:
                        if any(c in s for c in (sep, '"', "\n", "\r")) or (
                            null_mark and s == null_mark
                        ):
                            s = '"' + s.replace('"', '""') + '"'
                    else:
                        s = (
                            s.replace("\\", "\\\\")
                            .replace("\t", "\\t")
                            .replace("\n", "\\n")
                            .replace("\r", "\\r")
                        )
                        if sep != "\t" and sep in s:
                            s = s.replace(sep, "\\" + sep)
                    cells.append(s)
                return (sep.join(cells) + "\n").encode("utf-8")

        writer.write(M.copy_out_response(len(df.schema.fields), binary=is_binary))
        if is_binary:
            # PGCOPY v1 header: signature + flags + extension length
            writer.write(
                M.copy_data(b"PGCOPY\n\xff\r\n\x00" + struct.pack("!ii", 0, 0))
            )
        if is_csv and stmt.copy_header:
            writer.write(M.copy_data((sep.join(df.columns) + "\n").encode()))

        def start():
            sc = state.session.sparkContext
            sc.setJobGroup(state.job_group, stmt.copy_query[:200], interruptOnCancel=True)
            sc.setLocalProperty("spark.scheduler.pool", state.scheduler_pool)
            if self._incremental(state):
                return df.toLocalIterator(prefetchPartitions=True)
            return iter(df.collect())

        iterator = await asyncio.to_thread(start)
        # the vectorized text-format assembler hardcodes tab + \N; any
        # DELIMITER/NULL override falls back to the per-row renderer
        copy_ser = (
            RowSerializer(df.schema, [0] * len(df.schema.fields))
            if not is_csv
            and not is_binary
            and stmt.copy_delim in (None, "\t")
            and stmt.copy_null in (None, "\\N")
            else None
        )

        def encode_batch():
            batch = list(itertools.islice(iterator, FETCH_BATCH))
            if not batch:
                return 0, b""
            if copy_ser is not None:
                blob = copy_ser.serialize_copy_text_batch(batch)
                if blob is not None:
                    return len(batch), blob
            return len(batch), b"".join(render(r) for r in batch)

        sent = 0
        while True:
            n, blob = await asyncio.to_thread(encode_batch)
            if not n:
                break
            writer.write(M.copy_data(blob))
            sent += n
            await writer.drain()
        self.metrics.rows_sent += sent
        if is_binary:
            writer.write(M.copy_data(struct.pack("!h", -1)))  # PGCOPY trailer
        writer.write(M.copy_done())
        writer.write(M.command_complete(f"COPY {sent}"))
        await writer.drain()

    def _incremental(self, state) -> bool:
        if state.incremental_collect is not None:
            return state.incremental_collect
        return self.incremental_collect

    async def _copy_in(self, state, stmt, writer) -> None:
        """COPY table [(cols)] FROM STDIN [WITH (FORMAT {TEXT|CSV|BINARY} …)].

        Ingest extension (the reference rejects all COPY,
        ``protocol.scala:679-701``). Chunked: CopyData accumulates in a
        bounded driver buffer; once it exceeds ``copy_in_batch_bytes``
        the complete-row prefix is parsed and spilled to a parquet
        staging directory (pyarrow string batches for text/CSV, a typed
        Spark append for binary), so driver RSS is bounded by the batch
        size — never by the payload. CopyDone triggers ONE distributed
        read + ``insertInto`` over the staging dir; payloads that fit a
        single batch keep the zero-temp-IO direct path. Row boundaries
        at batch edges: text format — raw ``\\n`` is always a row end
        (in-value newlines arrive escaped); CSV — cut at the last
        newline with even quote parity (doubled quotes toggle twice);
        binary — tuples are length-framed, parse resumes exactly.
        """
        import os
        import shutil
        import tempfile

        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        table = stmt.cursor_name
        target = await asyncio.to_thread(state.session.table, table)
        cols = (
            [c.strip().strip('"') for c in stmt.copy_query.split(",")]
            if stmt.copy_query
            else list(target.columns)
        )
        is_binary = stmt.copy_format == "binary"
        is_csv = stmt.copy_format == "csv"
        writer.write(M.copy_in_response(len(cols), binary=is_binary))
        await writer.drain()

        target_types = {f.name: f.dataType for f in target.schema.fields}
        sep = stmt.copy_delim or ("," if is_csv else "\t")
        null_mark = stmt.copy_null if stmt.copy_null is not None else "\\N"
        decs: list = []
        typed_schema = None
        if is_binary:
            from spark_sql_server_spark.protocol.encoders import binary_decoder

            for c in cols:
                d = binary_decoder(target_types[c])
                if d is None:
                    raise ValueError(
                        "COPY BINARY does not support type "
                        f"{target_types[c].simpleString()}"
                    )
                decs.append(d)
            typed_schema = T.StructType(
                [T.StructField(c, target_types[c]) for c in cols]
            )
        header_pending = bool(is_csv and stmt.copy_header)

        def parse_text_batch(text: str) -> list[list]:
            nonlocal header_pending
            if is_csv:
                parsed = _csv_copy_rows(text, delim=sep)
                if header_pending and parsed:
                    parsed = parsed[1:]
                    header_pending = False
                rows = [r for r in parsed if r != ["\\."]]
                if stmt.copy_null is not None:
                    rows = [
                        [None if v == stmt.copy_null else v for v in r]
                        for r in rows
                    ]
                return rows
            rows = []
            for line in text.split("\n"):
                if not line or line == "\\.":
                    continue
                rows.append(
                    [
                        None if v == null_mark else _copy_unescape(v)
                        for v in _split_copy_fields(line, sep)
                    ]
                )
            return rows

        staging: str | None = None
        spill_seq = 0
        spilled_rows = 0

        def spill_strings(rows: list[list]) -> None:
            nonlocal staging, spill_seq, spilled_rows
            import pyarrow as pa
            import pyarrow.parquet as pq

            if staging is None:
                staging = tempfile.mkdtemp(prefix="pgcopy_in_")
            tbl = pa.Table.from_arrays(
                [
                    pa.array([r[i] for r in rows], type=pa.string())
                    for i in range(len(cols))
                ],
                names=list(cols),
            )
            pq.write_table(
                tbl, os.path.join(staging, f"part-{spill_seq:05d}.parquet")
            )
            spill_seq += 1
            spilled_rows += len(rows)

        def spill_typed(rows: list[list]) -> None:
            nonlocal staging, spill_seq, spilled_rows
            if staging is None:
                staging = tempfile.mkdtemp(prefix="pgcopy_in_")
            state.session.createDataFrame(rows, schema=typed_schema).write.mode(
                "append"
            ).parquet(staging)
            spill_seq += 1
            spilled_rows += len(rows)

        def carve() -> bytes:
            """Detach the longest complete-row prefix of ``buf``.

            The buffer always starts at a row boundary, so CSV quote
            parity counted from 0 is authoritative."""
            idx = buf.rfind(b"\n")
            if is_csv:
                while idx >= 0 and buf.count(b'"', 0, idx) % 2:
                    idx = buf.rfind(b"\n", 0, idx)
            if idx < 0:
                return b""
            prefix = bytes(buf[: idx + 1])
            del buf[: idx + 1]
            return prefix

        _BIN_SIG = b"PGCOPY\n\xff\r\n\x00"
        reader = state.reader
        buf = bytearray()
        peak = 0
        failed = False
        bin_header_done = False
        bin_done = False
        pending_rows: list[list] = []  # binary: parsed but unspilled
        bin_bytes_pending = 0
        batch_bytes = max(1, int(self.copy_in_batch_bytes))
        try:
            while True:
                hdr = await reader.readexactly(5)
                tag = hdr[:1]
                (length,) = struct.unpack("!i", hdr[1:5])
                body = (
                    await reader.readexactly(length - 4) if length > 4 else b""
                )
                if tag == b"c":
                    break
                if tag == b"f":
                    failed = True
                    break
                if tag != b"d":
                    continue  # 'H'/'S' flushes during COPY are ignored
                if bin_done and body:
                    # PG rejects at receipt, not at CopyDone — otherwise
                    # a client streaming junk after the -1 EOF trailer
                    # grows buf unboundedly until CopyDone
                    raise ValueError("received copy data after EOF marker")
                buf += body
                peak = max(peak, len(buf) + bin_bytes_pending)
                if is_binary:
                    if not bin_header_done and len(buf) >= len(_BIN_SIG) + 8:
                        if not buf.startswith(_BIN_SIG):
                            raise ValueError("invalid COPY BINARY signature")
                        _flags, extlen = struct.unpack_from(
                            "!ii", buf, len(_BIN_SIG)
                        )
                        if len(buf) >= len(_BIN_SIG) + 8 + extlen:
                            del buf[: len(_BIN_SIG) + 8 + extlen]
                            bin_header_done = True
                    if bin_header_done and not bin_done:
                        rows_b, consumed, bin_done = _parse_copy_binary_tuples(
                            buf, 0, decs
                        )
                        if consumed:
                            bin_bytes_pending += consumed
                            del buf[:consumed]
                        pending_rows.extend(rows_b)
                        if pending_rows and bin_bytes_pending >= batch_bytes:
                            await asyncio.to_thread(spill_typed, pending_rows)
                            pending_rows = []
                            bin_bytes_pending = 0
                elif len(buf) > batch_bytes:
                    prefix = carve()
                    if prefix:
                        rows_t = parse_text_batch(prefix.decode("utf-8"))
                        if rows_t:
                            await asyncio.to_thread(spill_strings, rows_t)
            self.last_copy_in_peak_buffer = peak
            if failed:
                raise ValueError(
                    "COPY FROM STDIN aborted by client (CopyFail)"
                )

            def _aligned(casted):
                # align to the full table schema; unlisted columns → NULL
                return casted.select(
                    *[
                        F.col(c) if c in cols
                        else F.lit(None).cast(target_types[c]).alias(c)
                        for c in target.columns
                    ]
                )

            def _run_insert(df):
                sc = state.session.sparkContext
                sc.setJobGroup(
                    state.job_group, stmt.sql[:200], interruptOnCancel=True
                )
                sc.setLocalProperty(
                    "spark.scheduler.pool", state.scheduler_pool
                )
                df.write.insertInto(table)

            if is_binary:
                if bin_header_done:
                    if bin_done:
                        # stream already hit the -1 end-of-data trailer;
                        # any residual bytes are junk, not tuples (PG:
                        # "received copy data after EOF marker")
                        if buf:
                            raise ValueError(
                                "received copy data after EOF marker"
                            )
                    else:
                        rows_b, consumed, bin_done = (
                            _parse_copy_binary_tuples(buf, 0, decs)
                        )
                        pending_rows.extend(rows_b)
                        if bin_done and consumed < len(buf):
                            raise ValueError(
                                "received copy data after EOF marker"
                            )
                elif buf:
                    # payload smaller than header+8: legacy whole parse
                    pending_rows = _parse_copy_binary(
                        bytes(buf), [target_types[c] for c in cols]
                    )
                if staging is None:
                    n = len(pending_rows)
                    if n:

                        def ingest_binary():
                            sdf = state.session.createDataFrame(
                                pending_rows, schema=typed_schema
                            )
                            _run_insert(_aligned(sdf))

                        await asyncio.to_thread(ingest_binary)
                else:
                    if pending_rows:
                        await asyncio.to_thread(spill_typed, pending_rows)
                    n = spilled_rows

                    def ingest_staged_binary():
                        sdf = state.session.read.schema(typed_schema).parquet(
                            staging
                        )
                        _run_insert(_aligned(sdf))

                    await asyncio.to_thread(ingest_staged_binary)
                writer.write(M.command_complete(f"COPY {n}"))
                await writer.drain()
                return

            tail_rows = parse_text_batch(buf.decode("utf-8")) if buf else []
            str_schema = T.StructType(
                [T.StructField(c, T.StringType()) for c in cols]
            )
            if staging is None:
                n = len(tail_rows)
                if n:

                    def ingest():
                        sdf = state.session.createDataFrame(
                            tail_rows, schema=str_schema
                        )
                        casted = sdf.select(
                            *[
                                F.col(c).cast(target_types[c]).alias(c)
                                for c in cols
                            ]
                        )
                        _run_insert(_aligned(casted))

                    await asyncio.to_thread(ingest)
            else:
                if tail_rows:
                    await asyncio.to_thread(spill_strings, tail_rows)
                n = spilled_rows

                def ingest_staged():
                    sdf = state.session.read.schema(str_schema).parquet(
                        staging
                    )
                    casted = sdf.select(
                        *[
                            F.col(c).cast(target_types[c]).alias(c)
                            for c in cols
                        ]
                    )
                    _run_insert(_aligned(casted))

                await asyncio.to_thread(ingest_staged)
            self.metrics.rows_sent += 0  # ingest: rows flow inward
            writer.write(M.command_complete(f"COPY {n}"))
            await writer.drain()
        finally:
            if staging is not None:
                shutil.rmtree(staging, ignore_errors=True)

    def _refresh_stat_views(self, state) -> None:
        """Register live monitoring views in this session (the PySpark
        equivalent of the reference's SQLServerListener + UI tab):

        * ``pg_stat_activity`` — one row per connected session, PG
          column names so psql habits and monitoring tools work.
        * ``pg_stat_server`` — one row of server counters
          (``ServerMetrics``) + uptime.
        """
        import datetime
        import time

        from pyspark.sql import types as T

        act_schema = T.StructType(
            [
                T.StructField("pid", T.IntegerType()),
                T.StructField("usename", T.StringType()),
                T.StructField("application_name", T.StringType()),
                T.StructField("backend_start", T.TimestampType()),
                T.StructField("state", T.StringType()),
                T.StructField("query", T.StringType()),
            ]
        )
        rows = [
            (
                s.pid,
                s.params.get("user", ""),
                s.params.get("application_name", ""),
                datetime.datetime.fromtimestamp(s.backend_start or 0),
                "active" if s.pid == state.pid else "idle",
                s.current_query or "",
            )
            for s in self._sessions.values()
        ]
        state.session.createDataFrame(rows, act_schema).createOrReplaceTempView(
            "pg_stat_activity"
        )
        m = self.metrics.snapshot()
        srv_schema = T.StructType(
            [T.StructField(k, T.LongType()) for k in m]
            + [
                T.StructField("active_sessions", T.LongType()),
                T.StructField("uptime_sec", T.LongType()),
            ]
        )
        srv_row = tuple(m.values()) + (
            len(self._sessions),
            int(time.time() - getattr(self, "_started_at", time.time())),
        )
        state.session.createDataFrame([srv_row], srv_schema).createOrReplaceTempView(
            "pg_stat_server"
        )

    async def _run_dml(self, state, stmt, args: dict | None = None) -> str:
        """Emulated UPDATE/DELETE (r11 VERDICT task 3): parse, rewrite
        to an equivalent SELECT, replace the relation. Session temp
        views re-register; wire-created MANAGED tables are overwritten
        from a localCheckpointed frame (the checkpoint materializes the
        new contents first, so the overwrite never reads the files it
        replaces). Registered parquet base tables and anything else
        answer a clean 0A000. Returns the PG command tag with the true
        matched-row count (``UPDATE n`` / ``DELETE n``)."""
        from spark_sql_server_spark.dialect.dml import (
            UnsupportedDml,
            build_count_sql,
            build_rewrite_sql,
            parse_dml,
        )

        spec = parse_dml(stmt.sql)
        sess = state.session
        boot = {v.lower() for v in state.boot_temp_views}

        def run():
            sc = sess.sparkContext
            sc.setJobGroup(state.job_group, stmt.sql[:200], interruptOnCancel=True)
            sc.setLocalProperty("spark.scheduler.pool", state.scheduler_pool)
            meta = sess.catalog.getTable(spec.table)  # 42P01 if absent
            ttype = (meta.tableType or "").upper()
            if spec.table.lower() in boot:
                raise UnsupportedDml(
                    f'cannot modify relation "{spec.table}": it is a '
                    "parquet-backed registered table (Spark storage is "
                    "immutable; only session temp views and tables "
                    "created over this connection are writable)"
                )
            if ttype == "TEMPORARY":
                mode = "view"
            elif ttype == "MANAGED":
                mode = "table"
            else:
                raise UnsupportedDml(
                    f'cannot modify {ttype.lower() or "external"} relation '
                    f'"{spec.table}": Spark-backed storage is immutable'
                )
            fields = sess.table(spec.table).schema.fields
            count_sql = rewrite_sql(build_count_sql(spec))
            cdf = sess.sql(count_sql, args=args) if args else sess.sql(count_sql)
            n = int(cdf.collect()[0][0])
            sel = rewrite_sql(build_rewrite_sql(spec, fields))
            df = sess.sql(sel, args=args) if args else sess.sql(sel)
            df = df.localCheckpoint(eager=True)
            if mode == "view":
                df.createOrReplaceTempView(spec.table)
            else:
                df.write.insertInto(spec.table, overwrite=True)
            return n

        n = await self._to_thread_with_timeout(state, run)
        return f"{spec.kind} {n}"

    async def _spark_sql(self, state, sql: str, args: dict | None = None) -> DataFrame:
        """Run spark.sql in a worker thread with this session's job group
        set (thread-local in the JVM → set in the same thread)."""
        state.current_query = sql
        if "pg_stat_" in sql:
            # monitoring views are snapshots: re-register right before a
            # statement that references them
            await asyncio.to_thread(self._refresh_stat_views, state)

        def run():
            sc = state.session.sparkContext
            sc.setJobGroup(state.job_group, sql[:200], interruptOnCancel=True)
            sc.setLocalProperty("spark.scheduler.pool", state.scheduler_pool)
            df = state.session.sql(sql, args=args) if args else state.session.sql(sql)
            return _wire_safe(df)

        return await self._to_thread_with_timeout(state, run)

    async def _to_thread_with_timeout(self, state, fn):
        """Run a blocking Spark phase in a worker thread, enforcing the
        session's PG ``statement_timeout``. On expiry the session's job
        group is cancelled (interruptOnCancel, same path as an
        out-of-band CancelRequest), the thread is awaited so it unwinds
        cleanly, and the PG-standard 57014 error surfaces. PG's timeout
        covers the whole statement; here each blocking phase (analyze /
        execute / fetch) gets the full budget — the practical difference
        is invisible to clients because the data-producing phase
        dominates."""
        task = asyncio.ensure_future(asyncio.to_thread(fn))
        timeout_ms = state.statement_timeout_ms
        if not timeout_ms:
            return await task
        try:
            return await asyncio.wait_for(asyncio.shield(task), timeout_ms / 1000.0)
        except asyncio.TimeoutError:
            try:
                state.session.sparkContext.cancelJobGroup(state.job_group)
            except Exception:  # noqa: BLE001 — context already stopped
                pass
            try:
                # bounded unwind: cancelJobGroup only interrupts RUNNING
                # Spark jobs — a phase stuck in parse/analysis (no job
                # yet) never unwinds, and an unbounded await would wedge
                # the session and delay the 57014 indefinitely. Give the
                # worker a short grace period, then surface the error
                # anyway (the orphaned thread finishes or dies on its
                # own; the job group stays cancelled either way).
                await asyncio.wait_for(asyncio.shield(task), 5.0)
            except Exception:  # noqa: BLE001
                pass  # expected: job was killed / still unwinding
            if not task.done():
                # abandoning the shielded task: retrieve its eventual
                # exception so asyncio never logs "Task exception was
                # never retrieved". Known concurrency window — until
                # the orphaned thread's Spark phase actually unwinds it
                # may overlap the session's next statement (its job
                # group stays cancelled, so any Spark job it launches
                # dies immediately).
                task.add_done_callback(
                    lambda t: t.exception() if not t.cancelled() else None
                )
            raise ValueError("canceling statement due to statement timeout")

    async def _stream_result(
        self,
        state,
        df: DataFrame,
        result_formats: list[int],
        writer,
        limit: int,
        portal: Portal | None = None,
        tag_word: str | None = None,
        sql: str | None = None,
        send_row_description: bool = False,
    ) -> None:
        """Send RowDescription (simple protocol only) + DataRows.

        Rows are pulled in FETCH_BATCH chunks inside worker threads; with
        incremental collect the iterator is ``toLocalIterator`` so driver
        memory is bounded by one partition at a time.
        """
        # Arrow columnar fast path: full-result fetch with no cursor
        # pacing and incremental collect off (the reference's default
        # mode). Skips Row materialization entirely; ~1.8× faster on
        # wide scans. Cursors and incremental mode use the iterator.
        use_arrow = (
            not self._incremental(state)
            and limit == 0
            and (portal is None or portal.iterator is None)
            and df is not None
            # a zero-column df loses its row count through toArrow()
            # (an Arrow table with no columns has num_rows 0) — the
            # iterator path carries empty Rows and keeps the count
            and len(df.schema.fields) > 0
            and not send_row_description  # SQL FETCH keeps the iterator path
        )
        if use_arrow:
            serializer = (
                portal.serializer
                if portal is not None and portal.serializer is not None
                else self._make_serializer(df, result_formats)
            )

            def arrow_all():
                sc = state.session.sparkContext
                sc.setJobGroup(state.job_group, (sql or "")[:200], interruptOnCancel=True)
                sc.setLocalProperty("spark.scheduler.pool", state.scheduler_pool)
                return serializer.serialize_arrow_table(df.toArrow())

            if portal is None:
                writer.write(self._row_description(df, result_formats))
            sent, blob = await self._to_thread_with_timeout(state, arrow_all)
            writer.write(blob)
            await writer.drain()
            self.metrics.rows_sent += sent
            if portal is not None:
                portal.exhausted = True
                portal.fetched += sent
                writer.write(M.command_complete(f"SELECT {sent}"))
            else:
                writer.write(M.command_complete(f"{tag_word or 'SELECT'} {sent}"))
            await writer.drain()
            return

        if portal is None or portal.iterator is None:
            def start():
                sc = state.session.sparkContext
                sc.setJobGroup(state.job_group, (sql or "")[:200], interruptOnCancel=True)
                sc.setLocalProperty("spark.scheduler.pool", state.scheduler_pool)
                if self._incremental(state):
                    return df.toLocalIterator(prefetchPartitions=True)
                return iter(df.collect())

            iterator = await self._to_thread_with_timeout(state, start)
            serializer = (
                portal.serializer if portal is not None and portal.serializer is not None
                else self._make_serializer(df, result_formats)
            )
            if portal is not None:
                portal.iterator = iterator
                portal.serializer = serializer
        else:
            iterator = portal.iterator
            serializer = portal.serializer

        if portal is None or send_row_description:
            writer.write(self._row_description(df, result_formats))

        sent = 0
        while True:
            want = FETCH_BATCH if limit == 0 else min(FETCH_BATCH, limit - sent)
            if want <= 0:
                break

            # serialize the whole batch in the worker thread and ship ONE
            # buffer to the transport — per-row write() calls on the event
            # loop dominate wire time for wide scans otherwise
            def fetch_encode(w=want):
                rows = list(itertools.islice(iterator, w))
                return len(rows), serializer.serialize_rows_batch(rows)

            n, blob = await asyncio.to_thread(fetch_encode)
            writer.write(blob)
            sent += n
            await writer.drain()
            if n < want:
                if portal is not None:
                    portal.exhausted = True
                break

        self.metrics.rows_sent += sent
        if send_row_description:
            # SQL-level FETCH: always CommandComplete, never PortalSuspended
            if portal is not None:
                portal.fetched += sent
            writer.write(M.command_complete(f"FETCH {sent}"))
            await writer.drain()
            return
        if portal is not None:
            portal.fetched += sent
            if not portal.exhausted and limit and sent >= limit:
                portal.suspended = True
                writer.write(M.portal_suspended())
                await writer.drain()
                return
            tag = f"FETCH {sent}" if (portal.is_cursor and limit) else f"SELECT {sent}"
            writer.write(M.command_complete(tag))
        else:
            writer.write(M.command_complete(f"{tag_word or 'SELECT'} {sent}"))
        await writer.drain()


def _parse_copy_binary(data: bytes, dtypes) -> list[list]:
    """Decode a PGCOPY v1 payload (signature header, int16 field count
    per row, int32-length-prefixed cells, int16 -1 trailer) into typed
    Python rows using the binary cell decoders."""
    from spark_sql_server_spark.protocol.encoders import binary_decoder

    decs = []
    for dt in dtypes:
        d = binary_decoder(dt)
        if d is None:
            raise ValueError(
                f"COPY BINARY does not support type {dt.simpleString()}"
            )
        decs.append(d)
    sig = b"PGCOPY\n\xff\r\n\x00"
    if not data.startswith(sig):
        raise ValueError("invalid COPY BINARY signature")
    pos = len(sig)
    _flags, extlen = struct.unpack_from("!ii", data, pos)
    pos += 8 + extlen
    rows, _, _ = _parse_copy_binary_tuples(data, pos, decs)
    return rows


def _parse_copy_binary_tuples(
    buf, pos: int, decs
) -> tuple[list[list], int, bool]:
    """Parse as many COMPLETE PGCOPY tuples as ``buf`` holds from
    ``pos`` (int16 field count, int32-length-prefixed cells, int16 -1
    trailer). Returns ``(rows, consumed_pos, trailer_seen)`` — a tuple
    cut off mid-stream is left unconsumed so a chunked caller can
    resume after appending more bytes."""
    rows: list[list] = []
    n = len(buf)
    while True:
        if pos + 2 > n:
            return rows, pos, False
        (nfield,) = struct.unpack_from("!h", buf, pos)
        if nfield == -1:
            return rows, pos + 2, True
        p = pos + 2
        vals: list = []
        complete = True
        for i in range(nfield):
            if p + 4 > n:
                complete = False
                break
            (ln,) = struct.unpack_from("!i", buf, p)
            p += 4
            if ln == -1:
                vals.append(None)
            else:
                if p + ln > n:
                    complete = False
                    break
                vals.append(decs[i](bytes(buf[p : p + ln])))
                p += ln
        if not complete:
            return rows, pos, False
        rows.append(vals)
        pos = p


_TIMEOUT_RE = re.compile(r"^\s*(\d+)\s*(us|ms|s|min|h|d)?\s*$", re.IGNORECASE)
_TIMEOUT_UNIT_MS = {
    None: 1.0, "us": 0.001, "ms": 1.0, "s": 1000.0,
    "min": 60000.0, "h": 3600000.0, "d": 86400000.0,
}


def _parse_timeout_ms(val: str) -> int:
    """PG statement_timeout value: bare integer = milliseconds, or an
    integer with a PG time unit suffix."""
    m = _TIMEOUT_RE.match(val)
    if not m:
        raise ValueError(
            f'invalid value for parameter "statement_timeout": "{val}"'
        )
    unit = m.group(2).lower() if m.group(2) else None
    return int(int(m.group(1)) * _TIMEOUT_UNIT_MS[unit])


def _ym_interval_pg_text(col: str) -> str:
    """PG-style rendering of a year-month interval ('1 year 2 mons',
    sign-aware, '00:00:00' for zero — PG's canonical forms)."""
    # cast through YEAR TO MONTH first: a YEAR-only interval casts to
    # YEARS as an int, a YTM interval to months — normalize to months
    m = f"CAST(CAST(`{col}` AS INTERVAL YEAR TO MONTH) AS INT)"
    y = f"(CASE WHEN {m} >= 0 THEN {m} div 12 ELSE -((-{m}) div 12) END)"
    mo = f"({m} - 12 * {y})"
    return (
        f"CASE WHEN {m} IS NULL THEN CAST(NULL AS STRING) "
        f"WHEN {m} = 0 THEN '00:00:00' "
        f"ELSE concat_ws(' ', "
        f"CASE WHEN {y} <> 0 THEN concat({y}, "
        # PG pluralizes everything except exactly 1 (so '-1 years')
        f"CASE WHEN {y} = 1 THEN ' year' ELSE ' years' END) END, "
        f"CASE WHEN {mo} <> 0 THEN concat({mo}, "
        f"CASE WHEN {mo} = 1 THEN ' mon' ELSE ' mons' END) END) END"
    )


def _has_uncollectable(dt) -> bool:
    """True when the type tree cannot survive PySpark's fromInternal:
    a YearMonthInterval/CalendarInterval anywhere (NOT_IMPLEMENTED), or
    a map whose KEY type is array/map/struct — fromInternal builds a
    Python dict and list/dict/Row keys raise ``unhashable type``
    (found wire-porting typeCoercion/native/mapconcat.sql: a plain
    ``map_concat(map(array('a'),…), …)`` crashed the row path)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.YearMonthIntervalType, T.CalendarIntervalType)):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_uncollectable(dt.elementType)
    if isinstance(dt, T.MapType):
        if isinstance(dt.keyType, (T.ArrayType, T.MapType, T.StructType)):
            return True
        return _has_uncollectable(dt.keyType) or _has_uncollectable(dt.valueType)
    if isinstance(dt, T.StructType):
        return any(_has_uncollectable(f.dataType) for f in dt.fields)
    return False


def _wire_safe(df: DataFrame):
    """Rewrite result columns PySpark cannot even collect
    (YearMonthIntervalType / CalendarIntervalType raise NOT_IMPLEMENTED
    in fromInternal) into text: top-level year-month intervals render
    PG-style, calendar intervals via Spark's string cast, and a column
    with an interval nested in an array/struct/map is cast to string
    wholesale. Day-time intervals collect fine and keep their typed PG
    rendering in encoders.py."""
    from pyspark.sql import types as T

    fields = df.schema.fields
    if not any(_has_uncollectable(f.dataType) for f in fields):
        return df
    exprs = []
    for f in fields:
        quoted = f.name.replace("`", "``")
        if isinstance(f.dataType, T.YearMonthIntervalType):
            exprs.append(f"{_ym_interval_pg_text(quoted)} AS `{quoted}`")
        elif isinstance(f.dataType, T.CalendarIntervalType):
            exprs.append(f"CAST(`{quoted}` AS STRING) AS `{quoted}`")
        elif _has_uncollectable(f.dataType):
            exprs.append(f"CAST(`{quoted}` AS STRING) AS `{quoted}`")
        else:
            exprs.append(f"`{quoted}`")
    return df.selectExpr(*exprs)


def _is_command(sql: str) -> bool:
    head = sql.lstrip().split(None, 1)
    return bool(head) and head[0].upper() in _COMMAND_KEYWORDS


def _dml_rowcount(df: DataFrame) -> int:
    """Best-effort written-row count for the PG command tag: Spark's
    write commands expose it as the ``numOutputRows`` metric on the
    executed command plan (``INSERT 0 0`` regardless of rows written —
    found driving postgreSQL/insert.sql through real psql — misleads
    clients that parse the tag for cursor.rowcount)."""
    try:
        cmd = df._jdf.queryExecution().executedPlan().commandPhysicalPlan()
        it = cmd.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if str(kv._1()) == "numOutputRows":
                return int(kv._2().value())
    except Exception:  # noqa: BLE001 — tag cosmetics never fail a query,
        # but a Spark upgrade breaking the py4j reach-through would
        # silently degrade tags to 'INSERT 0 0'; keep it observable
        log.debug("rowcount metric unavailable; tag falls back to 0",
                  exc_info=True)
    return 0


def _tag_for(sql: str, rows: int = 0, df: DataFrame | None = None) -> str:
    head = sql.lstrip().split(None, 2)
    word = head[0].upper() if head else "OK"
    if word == "INSERT":
        if df is not None:
            rows = _dml_rowcount(df)
        return f"INSERT 0 {rows}"
    if word in ("CREATE", "DROP", "ALTER", "TRUNCATE"):
        # PG tags carry the object kind: CREATE TABLE, DROP VIEW, …
        # (psql prints the tag; pg_dump-restore transcripts diff clean)
        mods = {"OR", "REPLACE", "IF", "NOT", "EXISTS", "TEMP",
                "TEMPORARY", "EXTERNAL", "GLOBAL", "UNIQUE",
                "MATERIALIZED"}
        kinds = {"TABLE", "VIEW", "SCHEMA", "DATABASE", "NAMESPACE",
                 "FUNCTION", "INDEX", "SEQUENCE", "TYPE", "EXTENSION",
                 "ROLE", "TRIGGER"}
        for w in sql.split()[1:6]:
            u = w.upper()
            if u in mods:
                continue
            if u in kinds:
                return f"{word} {u}"
            break
        if word == "TRUNCATE":
            return "TRUNCATE TABLE"  # PG's tag even for the bare form
    return word


def _errmsg(e: Exception) -> str:
    s = str(e)
    return s if len(s) < 4000 else s[:4000] + "…"


#: Spark error-class fragments → PG SQLSTATEs, so clients branch on the
#: code like they would against real PG.
_SQLSTATE_MAP = (
    ("PARSE_SYNTAX_ERROR", "42601"),
    ("TABLE_OR_VIEW_NOT_FOUND", "42P01"),
    ("UNRESOLVED_COLUMN", "42703"),
    ("UNRESOLVED_ROUTINE", "42883"),
    ("DATATYPE_MISMATCH", "42804"),
    ("DIVIDE_BY_ZERO", "22012"),
    ("CAST_INVALID_INPUT", "22P02"),
    ("NUMERIC_VALUE_OUT_OF_RANGE", "22003"),
    ("Operation not allowed", "0A000"),
    # Hive-backed DDL in a session built without Hive support (e.g.
    # SPARK_GRAFT_NO_HIVE=1) → feature_not_supported, not internal error
    ("NOT_SUPPORTED_COMMAND_WITHOUT_HIVE_SUPPORT", "0A000"),
    ("Hive support is required", "0A000"),
    ("TABLE_OR_VIEW_ALREADY_EXISTS", "42P07"),
    ("unrecognized configuration parameter", "42704"),  # undefined_object
    ("statement timeout", "57014"),  # query_canceled
    ("invalid value for parameter", "22023"),
)


def _sqlstate_for(e: Exception) -> str:
    # typed errors carry their own SQLSTATE (UnsupportedDml → 0A000,
    # ScramError → 28P01/…)
    code = getattr(e, "sqlstate", None)
    if isinstance(code, str) and len(code) == 5:
        return code
    s = str(e)
    # statement-level PREPARE/EXECUTE/cursor errors, PG-coded so
    # clients can branch on them (PG appendix A)
    if "wrong number of parameters" in s:
        return "42601"  # before the prepared-statement rule below
    if "COPY delimiter must be" in s:
        return "0A000"
    if 'prepared statement "' in s:
        return "42P05" if "already exists" in s else "26000"
    if 'cursor "' in s and "does not exist" in s:
        return "34000"
    for frag, code in _SQLSTATE_MAP:
        if frag in s:
            return code
    return "XX000"
