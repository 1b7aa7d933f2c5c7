"""Streaming operators surfaced through the driver contract.

Runs the Structured Streaming pipeline (file source → watermarked
window agg → memory sink, availableNow trigger) inside a ``queries()``
call and returns the materialized result — so the driver's correctness
gate covers the streaming engine itself, not just its batch twin.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table


def _finalize(
    spark: SparkSession,
    df: DataFrame,
    sink: str | None = None,
    dirs: tuple[str, ...] = (),
) -> DataFrame:
    """Materialize the (small) final result eagerly, then release the
    run's resources: the memory-sink temp view (which otherwise pins
    the full drained stream in driver memory forever) and the temp
    source/sink/checkpoint dirs. Without this every invocation of a
    streaming operator on a long-running server leaks driver memory
    and /tmp — the same per-invocation-leak class the persist()→
    localCheckpoint rule exists for. localCheckpoint blocks are
    reclaimed by the ContextCleaner once the returned DF is dropped."""
    try:
        return df.localCheckpoint()
    finally:
        if sink is not None:
            spark.catalog.dropTempView(sink)
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)

_STREAM_HOURLY_ORACLE = """
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    ORDER BY hour, event_type
"""


_STREAM_SESSION_ORACLE = """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
"""


@query(
    "st_sessionize_stream",
    oracle=_STREAM_SESSION_ORACLE,
    covers="streaming: gap-based session windows executed by the streaming "
    "engine (session_window + watermark, availableNow drain)",
)
def st_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows computed by Structured Streaming's
    native ``session_window`` stateful operator.

    Semantics pinned by the oracle: ``session_window`` merges an event
    into the previous session iff its gap is *strictly less* than 30
    minutes (the oracle's ``>= INTERVAL '30 minutes'`` boundary starts a
    new session), and a session's end is last_event + gap. State is
    O(open sessions) and watermark-bounded at scale; the availableNow
    drain with a complete-mode memory sink makes the one-shot result
    comparable to the batch recursive-gap formulation.
    """
    from spark_sql_server_spark.streaming import events_stream, sessionized_events

    src = tempfile.mkdtemp(prefix="st-sess-src-")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    sink = f"st_sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessionized_events(events_stream(spark, src))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    result = (
        spark.table(sink)
        .select(
            "user_id",
            F.col("session_start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
    return _finalize(spark, result, sink=sink, dirs=(src,))


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
    result = (
        spark.table(sink)
        .select(
            F.col("hour").cast("timestamp_ntz").alias("hour"),
            "event_type",
            "n_events",
        )
        .orderBy("hour", "event_type")
    )
    return _finalize(spark, result, sink=sink, dirs=(src,))

_STREAM_ENRICH_ORACLE = """
    SELECT event_type, c_mktsegment, COUNT(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY event_type, c_mktsegment
    ORDER BY event_type, c_mktsegment
"""


@query(
    "st_enrich_stream",
    oracle=_STREAM_ENRICH_ORACLE,
    covers="streaming: stream-static broadcast join + parquet file sink "
    "with checkpointing (availableNow drain)",
)
def st_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment through a durable file sink: events
    stream joined to the customer dimension per micro-batch, appended
    to parquet with a checkpoint (exactly-once file-sink semantics),
    then aggregated from the sink output.

    Covers the two remaining streaming surfaces in one op: the
    stream-static broadcast join (map-only per batch, no streaming
    state, static side re-planned each batch) and the transactional
    file sink + checkpoint pair — the shape of a production ingest
    pipeline. The aggregate over the sink's files must equal the batch
    join oracle: the sink wrote exactly-once.
    """
    from spark_sql_server_spark.streaming import enrich_events, events_stream

    src = tempfile.mkdtemp(prefix="st-enrich-src-")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    out = tempfile.mkdtemp(prefix="st-enrich-out-")
    ckpt = tempfile.mkdtemp(prefix="st-enrich-ckpt-")
    q = (
        enrich_events(events_stream(spark, src), dim)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    result = (
        spark.read.parquet(out)
        .groupBy("event_type", "c_mktsegment")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type", "c_mktsegment")
    )
    return _finalize(spark, result, dirs=(src, out, ckpt))


_STREAM_DEDUP_ORACLE = """
    SELECT event_id, ts, user_id, event_type, value, props
    FROM events
    ORDER BY event_id
"""


@query(
    "st_dedup_stream",
    oracle=_STREAM_DEDUP_ORACLE,
    covers="streaming: watermark-bounded exactly-once dedup "
    "(dropDuplicatesWithinWatermark over a replayed source)",
)
def st_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once delivery from an at-least-once source: every event
    file is replayed twice into the stream, and the watermark-bounded
    dedup must emit each event_id exactly once — so the drained sink
    equals the events table bit-for-bit (the oracle is the table
    itself).

    Scale: unlike a plain dropDuplicates (state grows forever), the
    watermark lets the engine drop seen-id state once event time
    passes, so state is O(ids per watermark window), not O(stream).
    """
    from spark_sql_server_spark.streaming import events_stream, stream_dedup

    src = tempfile.mkdtemp(prefix="st-dedup-src-")
    ev = load_table(spark, sf_dir, "events").repartition(4)
    ev.write.mode("overwrite").parquet(src)
    ev.write.mode("append").parquet(src)  # the replay: every event twice

    sink = f"st_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        stream_dedup(events_stream(spark, src))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    result = (
        spark.table(sink)
        .select(
            "event_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        .orderBy("event_id")
    )
    return _finalize(spark, result, sink=sink, dirs=(src,))


_RUNNING_TOTALS_ORACLE = """
    SELECT user_id,
           COUNT(*) AS n_events,
           SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) / 1000000.0
             AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
"""


@query(
    "st_running_totals",
    oracle=_RUNNING_TOTALS_ORACLE,
    covers="streaming: custom stateful operator via applyInPandasWithState "
    "(Arrow-batched per-user running totals, fixed-point state)",
)
def st_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals computed by the custom-stateful-operator
    escape hatch (``applyInPandasWithState``), drained to a final
    snapshot.

    The state op emits a cumulative (count, micro-unit total) row per
    user per micro-batch; the final per-user value is the max (both
    counters are monotone), so the result is identical however
    availableNow splits the input into batches. Fixed-point micro-unit
    accumulation makes the total independent of addition order — the
    oracle compares bit-for-bit, not within-epsilon. State is O(users);
    at scale it hash-partitions across executors like any keyed state.
    """
    from spark_sql_server_spark.streaming import (
        events_stream,
        user_running_totals_exact,
    )

    src = tempfile.mkdtemp(prefix="st-running-src-")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    sink = f"st_running_{uuid.uuid4().hex[:8]}"
    q = (
        user_running_totals_exact(events_stream(spark, src))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    result = (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_micros").alias("total_micros"),
        )
        .select(
            "user_id",
            "n_events",
            (F.col("total_micros") / F.lit(1000000.0)).alias("total_value"),
        )
        .orderBy("user_id")
    )
    return _finalize(spark, result, sink=sink, dirs=(src,))


_STREAM_ATTRIB_ORACLE = """
    SELECT a.event_id AS view_id, b.event_id AS click_id, a.user_id,
           a.ts AS view_ts, b.ts AS click_ts
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'view' AND b.event_type = 'click'
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '2 hours'
    ORDER BY view_id, click_id
"""


@query(
    "st_stream_stream_join",
    oracle=_STREAM_ATTRIB_ORACLE,
    covers="streaming: stream-stream inner join with event-time bound "
    "(view→click attribution; watermarked state on both sides)",
)
def st_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click attribution computed by a genuine two-streaming-sides join
    (views and clicks both read as streams from the same replayed
    source) — must equal the batch interval self-join bit-for-bit.

    Scale: state is bounded by the watermarks + the join's event-time
    bound (views droppable after click-watermark passes view_ts + 2h);
    the join hash-partitions both sides by user_id like any keyed
    streaming state.
    """
    from spark_sql_server_spark.streaming import (
        events_stream,
        view_click_attribution,
    )

    src = tempfile.mkdtemp(prefix="st-attrib-src-")
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(src)

    sink = f"st_attrib_{uuid.uuid4().hex[:8]}"
    q = (
        view_click_attribution(events_stream(spark, src))
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    result = (
        spark.table(sink)
        .select(
            "view_id",
            "click_id",
            "user_id",
            F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        )
        .orderBy("view_id", "click_id")
    )
    return _finalize(spark, result, sink=sink, dirs=(src,))
