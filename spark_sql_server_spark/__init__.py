"""spark_sql_server_spark — a PySpark-native SQL server.

A brand-new engine with the query and data-processing capabilities of
the reference PostgreSQL-protocol Spark gateway (maropu/spark-sql-server,
surveyed in SURVEY.md): every relational operator is expressed through
the public PySpark DataFrame / SQL API so Catalyst + AQE own all
optimization and physical planning, and the server layer adds only
protocol, dialect, catalog-emulation, and session management — plus
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the reference does not have.
"""

__version__ = "0.1.0"

from spark_sql_server_spark.session import build_session, register_tables, TABLES

__all__ = ["build_session", "register_tables", "TABLES", "__version__"]
