"""PostgreSQL dialect shim.

The reference forks Spark's ANTLR grammar (~4900 LoC) to accept PG
syntax (SURVEY.md §2.A16-A22). PySpark cannot fork the Scala parser, and
the dialect delta is small — so this package implements the same surface
as a string-level SQL rewriter in front of stock ``spark.sql``, plus
interception of the commands PG clients send that Spark must not see
(BEGIN / COMMIT / ROLLBACK / SET).
"""

from spark_sql_server_spark.dialect.rewriter import rewrite_sql
from spark_sql_server_spark.dialect.commands import classify_statement, StatementClass

__all__ = ["rewrite_sql", "classify_statement", "StatementClass"]
