"""HTTP monitoring surface for the PG server.

The reference ships a Spark listener plus a web UI tab showing session
and statement statistics (reference ``SQLServerListener.scala``,
``ui/SQLServerPage.scala``). SQL clients get the same data through the
live ``pg_stat_activity`` / ``pg_stat_server`` views; this module gives
operators the HTTP equivalent — the same :class:`ServerMetrics` counters
and session table, with zero dependencies beyond the stdlib event loop
the protocol server already runs on.

Endpoints:

* ``GET /metrics`` — Prometheus text exposition (counters + gauges),
  scrapeable by any Prometheus-compatible agent.
* ``GET /metrics.json`` — the same snapshot plus the per-session
  activity table and the recent-statements ring, as one JSON object.
* ``GET /`` (also ``/status``) — a human-readable HTML status page:
  server counters, live sessions, and the last 100 statements with
  durations — the same tables the reference renders in its Spark UI
  tab (``ui/SQLServerPage.scala``: session stats + statement stats).
* ``GET /healthz`` — liveness probe (200 once the wire listener is up).

Scale note: handlers read in-memory counters and the session dict only —
no Spark jobs, no driver↔executor traffic — so scraping is safe at any
frequency against a loaded server.
"""

from __future__ import annotations

import asyncio
import json
import logging
import time

log = logging.getLogger(__name__)

_MAX_REQUEST = 8192  # request line + headers; no bodies accepted


class MetricsHTTPServer:
    """Minimal asyncio HTTP/1.1 server bound to a ``SparkPGServer``."""

    def __init__(self, pg_server, host: str = "127.0.0.1", port: int = 0):
        self.pg = pg_server
        self.host = host
        self.port = port
        self._server: asyncio.AbstractServer | None = None

    async def start(self) -> None:
        self._server = await asyncio.start_server(self._handle, self.host, self.port)
        self.port = self._server.sockets[0].getsockname()[1]
        log.info("metrics endpoint on http://%s:%s/metrics", self.host, self.port)

    async def stop(self) -> None:
        if self._server:
            self._server.close()
            await self._server.wait_closed()
            self._server = None

    # ------------------------------------------------------------------ #

    def _snapshot(self) -> dict:
        m = self.pg.metrics.snapshot()
        m["active_sessions"] = len(self.pg._sessions)
        m["uptime_sec"] = int(time.time() - getattr(self.pg, "_started_at", time.time()))
        return m

    def _sessions(self) -> list[dict]:
        return [
            {
                "pid": s.pid,
                "usename": s.params.get("user", ""),
                "application_name": s.params.get("application_name", ""),
                "backend_start": s.backend_start,
                "query": s.current_query or "",
            }
            for s in self.pg._sessions.values()
        ]

    def _statements(self) -> list[dict]:
        return list(getattr(self.pg.metrics, "recent_statements", ()))

    def _status_html(self) -> str:
        import html as H

        snap = self._snapshot()
        counters = "".join(
            f"<tr><td>{H.escape(k)}</td><td>{v}</td></tr>"
            for k, v in snap.items()
        )
        sessions = "".join(
            "<tr>"
            f"<td>{s['pid']}</td><td>{H.escape(s['usename'])}</td>"
            f"<td>{H.escape(s['application_name'])}</td>"
            f"<td>{time.strftime('%H:%M:%S', time.localtime(s['backend_start']))}</td>"
            f"<td><code>{H.escape(s['query'][:120])}</code></td>"
            "</tr>"
            for s in self._sessions()
        )
        stmts = "".join(
            "<tr>"
            f"<td>{st['pid']}</td>"
            f"<td>{time.strftime('%H:%M:%S', time.localtime(st['started']))}</td>"
            f"<td>{st['duration_ms']}</td><td>{H.escape(st['state'])}</td>"
            f"<td><code>{H.escape(st['query'][:160])}</code></td>"
            "</tr>"
            for st in reversed(self._statements())
        )
        return f"""<!doctype html><html><head><meta charset="utf-8">
<title>spark-sql-server status</title>
<style>
 body {{ font: 14px/1.4 system-ui, sans-serif; margin: 2em; color: #222 }}
 h2 {{ margin-top: 1.5em }}
 table {{ border-collapse: collapse; min-width: 40em }}
 th, td {{ border: 1px solid #ccc; padding: 3px 9px; text-align: left }}
 th {{ background: #f2f2f2 }}
 code {{ font-size: 12px }}
</style></head><body>
<h1>spark-sql-server</h1>
<h2>Server</h2>
<table><tr><th>metric</th><th>value</th></tr>{counters}</table>
<h2>Sessions ({snap["active_sessions"]})</h2>
<table><tr><th>pid</th><th>user</th><th>application</th><th>started</th>
<th>current query</th></tr>{sessions}</table>
<h2>Recent statements (newest first)</h2>
<table><tr><th>pid</th><th>started</th><th>ms</th><th>state</th>
<th>statement</th></tr>{stmts}</table>
</body></html>"""

    def _prometheus(self) -> str:
        snap = self._snapshot()
        gauges = {"active_sessions", "uptime_sec"}
        lines = []
        for key, value in snap.items():
            kind = "gauge" if key in gauges else "counter"
            lines.append(f"# TYPE pg_server_{key} {kind}")
            lines.append(f"pg_server_{key} {value}")
        return "\n".join(lines) + "\n"

    async def _handle(self, reader, writer) -> None:
        try:
            raw = await asyncio.wait_for(reader.readuntil(b"\r\n\r\n"), timeout=10)
            if len(raw) > _MAX_REQUEST:
                raise ValueError("request too large")
            method, path, *_ = raw.split(b"\r\n", 1)[0].decode("latin-1").split(" ")
            path = path.split("?", 1)[0]
            if method != "GET":
                body, ctype, status = b"method not allowed\n", "text/plain", 405
            elif path == "/metrics":
                body = self._prometheus().encode()
                ctype, status = "text/plain; version=0.0.4", 200
            elif path == "/metrics.json":
                body = json.dumps(
                    {
                        "server": self._snapshot(),
                        "sessions": self._sessions(),
                        "statements": self._statements(),
                    }
                ).encode()
                ctype, status = "application/json", 200
            elif path in ("/", "/status"):
                body = self._status_html().encode()
                ctype, status = "text/html; charset=utf-8", 200
            elif path == "/healthz":
                body, ctype, status = b"ok\n", "text/plain", 200
            else:
                body, ctype, status = b"not found\n", "text/plain", 404
        except Exception:
            body, ctype, status = b"bad request\n", "text/plain", 400
        reason = {200: "OK", 400: "Bad Request", 404: "Not Found", 405: "Method Not Allowed"}[status]
        writer.write(
            (
                f"HTTP/1.1 {status} {reason}\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n"
                "Connection: close\r\n\r\n"
            ).encode()
            + body
        )
        try:
            await writer.drain()
        finally:
            writer.close()
