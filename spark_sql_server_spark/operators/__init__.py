"""Operator implementations exposed as named queries.

Every operator from SURVEY.md §2 (and the beyond-reference LLM-pipeline
operators) registers itself in :mod:`.registry` so the driver contract
(``__spark_entry__.queries()`` / ``oracle_sql()``) and the benchmark
harness share one source of truth.
"""

from spark_sql_server_spark.operators import (  # noqa: F401
    analytics,
    dedup,
    multimodal,
    pandas_ops,
    pipeline_ops,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    sampling,
    similarity,
    streaming_ops,
    temporal,
    textops,
)
from spark_sql_server_spark.operators.registry import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
