"""Standalone server launcher.

    python -m spark_sql_server_spark [--host H] [--port P] [--sf-dir DIR]

Boots the shared SparkSession, registers the test tables as views,
initializes pg_catalog, and serves the PG V3 protocol until SIGINT —
the PySpark twin of the reference's ``sbin/start-sql-server.sh``.
"""

from __future__ import annotations

import argparse
import asyncio
import logging


def main() -> None:
    p = argparse.ArgumentParser(description="PySpark PostgreSQL-protocol SQL server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=5432)
    p.add_argument(
        "--sf-dir",
        default=None,
        help="testdata dir to register as views (default: $SPARK_GRAFT_SF_DIR)",
    )
    p.add_argument("--no-incremental", action="store_true",
                   help="collect() results instead of toLocalIterator()")
    p.add_argument("--idle-session-timeout", type=float, default=0.0,
                   help="seconds before an idle session is reaped (0 = never)")
    p.add_argument("--ssl-self-signed", action="store_true",
                   help="enable TLS with a generated self-signed certificate")
    p.add_argument("--ssl-cert", default=None)
    p.add_argument("--ssl-key", default=None)
    p.add_argument("--execution-mode", default=None,
                   choices=["multi-session", "single-session"],
                   help="session isolation (reference spark.sql.server.executionMode)")
    p.add_argument("--no-binary-transfer", action="store_true",
                   help="force text format for all results "
                        "(reference spark.sql.server.binaryTransferMode=false)")
    p.add_argument("--metrics-port", type=int, default=None,
                   help="serve GET /metrics (Prometheus), /metrics.json and "
                        "/healthz on this port (0 = ephemeral; default off)")
    p.add_argument("--metrics-host", default=None,
                   help="bind address for the metrics endpoint (default "
                        "127.0.0.1 — the endpoint is unauthenticated and "
                        "shows live SQL text, so it never inherits --host; "
                        "widen explicitly at your own risk)")
    p.add_argument("--copy-in-batch-bytes", type=int, default=32 << 20,
                   help="COPY FROM STDIN spills complete-row batches to a "
                        "parquet staging dir past this driver-buffer bound "
                        "(default 32 MiB)")
    p.add_argument("--scroll-buffer-max-rows", type=int, default=1_000_000,
                   help="SCROLL cursors buffer fetched-so-far rows on the "
                        "driver; past this bound the fetch fails with PG's "
                        "54000 program_limit_exceeded instead of OOMing "
                        "(default 1M rows)")
    p.add_argument("--auth", default="trust",
                   choices=["trust", "password", "md5", "scram-sha-256"],
                   help="client authentication: trust (default), cleartext "
                        "password, md5 challenge-response, or "
                        "SCRAM-SHA-256 (RFC 7677 SASL)")
    p.add_argument("--auth-password", default=None,
                   help="the single accepted password for --auth modes "
                        "(default: $SPARK_PG_PASSWORD)")
    p.add_argument("--tx-noop", action="store_true",
                   help="COMMIT/ROLLBACK answer like PG outside a "
                        "transaction (WARNING + tag) instead of the "
                        "reference's rejection — pgbench and "
                        "BEGIN..COMMIT-wrapping loaders need it")
    p.add_argument("-v", "--verbose", action="store_true")
    args = p.parse_args()

    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO)

    from spark_sql_server_spark.protocol.server import SparkPGServer
    from spark_sql_server_spark.session import DEFAULT_SF_DIR, build_session, register_tables

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = build_session("spark-pg-server")

    import os

    auth_password = args.auth_password or os.environ.get("SPARK_PG_PASSWORD")
    if args.auth != "trust" and not auth_password:
        p.error(f"--auth {args.auth} requires --auth-password or $SPARK_PG_PASSWORD")

    server = SparkPGServer(
        spark,
        host=args.host,
        port=args.port,
        auth=args.auth,
        tx_noop=args.tx_noop,
        password_check=(
            (lambda user, pw: pw == auth_password) if auth_password else None
        ),
        password_lookup=(
            (lambda user: auth_password) if auth_password else None
        ),
        incremental_collect=not args.no_incremental,
        init_session=lambda s: register_tables(s, sf_dir),
        idle_session_timeout=args.idle_session_timeout,
        ssl_self_signed=args.ssl_self_signed,
        ssl_cert=args.ssl_cert,
        ssl_key=args.ssl_key,
        execution_mode=args.execution_mode,
        binary_transfer=False if args.no_binary_transfer else None,
        metrics_port=args.metrics_port,
        metrics_host=args.metrics_host,
        copy_in_batch_bytes=args.copy_in_batch_bytes,
        scroll_buffer_max_rows=args.scroll_buffer_max_rows,
    )

    async def run() -> None:
        await server.start()
        logging.info("ready: psql -h %s -p %s", args.host, server.port)
        if server.metrics_server:
            logging.info(
                "metrics: http://%s:%s/metrics",
                server.metrics_server.host,
                server.metrics_server.port,
            )
        try:
            await asyncio.Event().wait()
        finally:
            await server.stop()

    try:
        asyncio.run(run())
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
