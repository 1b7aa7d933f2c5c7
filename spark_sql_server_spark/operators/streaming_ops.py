"""Streaming operators surfaced through the driver contract.

Runs the Structured Streaming pipeline (file source → watermarked
window agg → memory sink, availableNow trigger) inside a ``queries()``
call and returns the materialized result — so the driver's correctness
gate covers the streaming engine itself, not just its batch twin.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table

_STREAM_HOURLY_ORACLE = """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
"""


@query(
    "st_hourly_stream",
    oracle=_STREAM_HOURLY_ORACLE,
    covers="streaming: tumbling-window agg executed by the streaming engine "
    "(file source → watermark → window → memory sink, availableNow)",
)
def st_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts computed by Structured Streaming.

    The events table is re-sharded to a temp dir (file streaming sources
    read directories), streamed through the watermarked tumbling-window
    aggregation, and drained with availableNow into a memory sink. The
    result must equal the batch date_trunc aggregation — one engine, two
    execution modes, same answer.
    """
    from spark_sql_server_spark.streaming import events_stream, hourly_event_counts

    src = tempfile.mkdtemp(prefix="st-hourly-src-")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    sink = f"st_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        hourly_event_counts(events_stream(spark, src))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(sink)
        .select(
            F.col("hour").cast("timestamp_ntz").alias("hour"),
            "event_type",
            "n_events",
        )
        .orderBy("hour", "event_type")
    )