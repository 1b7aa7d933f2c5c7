"""PostgreSQL V3 wire protocol endpoint.

A Python asyncio re-expression of the reference's Netty server
(SURVEY.md §2.A1-A15): StartupMessage/auth, simple ('Q') and extended
('P'/'B'/'D'/'E'/'C'/'S') query protocols, per-column text/binary
encodings with the PG oid map, portals/cursors with client-paced
fetching, out-of-band cancellation, and per-connection Spark session
isolation.
"""

from spark_sql_server_spark.protocol.server import SparkPGServer

__all__ = ["SparkPGServer"]
