"""Plan inspection utilities.

The engine adds no Catalyst rules (SURVEY.md §4: parity needs none) —
this package is the *observability* side: helpers to interrogate the
physical plan for the properties that matter at 100 TB (pushdown,
pruning, join strategies, shuffle counts). Used by the plan-quality
test gates and available to users for their own assertions.
"""

from spark_sql_server_spark.plans.inspect import (
    executed_plan,
    exchange_count,
    has_operator,
    pushed_filters,
    read_schemas,
)

__all__ = [
    "executed_plan",
    "exchange_count",
    "has_operator",
    "pushed_filters",
    "read_schemas",
]
