"""pg_catalog emulation + PG system functions.

The reference materializes 16 dummy catalog tables and registers 16
system UDFs so PostgreSQL clients (psql ``\\l``/``\\d``/``\\df``, JDBC
``DatabaseMetaData``) can run their metadata SQL unmodified
(``service/postgresql/catalog.scala:87-379``). Same surface here,
re-expressed with PySpark: literal DataFrames saved into a real
``pg_catalog`` database once at server start, plus per-session
``spark.udf.register`` calls.
"""

from spark_sql_server_spark.catalog.pg_catalog import (
    init_pg_catalog,
    refresh_runtime_catalog,
)
from spark_sql_server_spark.catalog.functions import init_system_functions

__all__ = ["init_pg_catalog", "refresh_runtime_catalog", "init_system_functions"]
