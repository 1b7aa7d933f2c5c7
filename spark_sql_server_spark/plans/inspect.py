"""Physical-plan interrogation over the public queryExecution API."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan as text (post-AQE top-level view)."""
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list that reached a scan.

    Scan metadata is rendered under ``spark.sql.maxMetadataStringLength``
    (default 100 chars) — long filter lists lose their closing bracket
    and would silently match nothing, so widen the limit for the
    duration of the render."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        return re.findall(r"PushedFilters: \[([^\]]*)\]", executed_plan(df))
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan — the column-pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", executed_plan(df))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (excludes broadcast exchanges)."""
    plan = executed_plan(df)
    return len(re.findall(r"(?<!Broadcast)Exchange", plan))


def has_operator(df: DataFrame, name: str) -> bool:
    return name in executed_plan(df)


def join_strategies(df: DataFrame) -> list[str]:
    """The join operators in the plan, in order of appearance."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        executed_plan(df),
    )
