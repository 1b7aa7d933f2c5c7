"""Streaming operators over the events schema.

Every operator takes a *streaming* DataFrame (from
:func:`events_stream` or any source with the same schema) and returns a
transformed streaming DataFrame — sinks are the caller's choice
(tests use memory + availableNow; production would use kafka/parquet
with checkpointing).

Scale notes: all stateful operators below key their state by
user/window, so state is hash-partitioned across executors; watermarks
bound state size — without them a 100 TB replay would accumulate
unbounded window state.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream over parquet event files with an explicit
    schema (streaming sources must not infer)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregate — the streaming twin of the
    batch ``q_events_hourly`` query.

    The watermark lets Spark drop window state once event time passes
    (window_end + 2h); late events inside the watermark still update
    their window.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized_events(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows (gap-based) per user — the streaming counterpart
    of the lag+running-sum batch sessionization."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event stream: drop duplicate event_ids arriving
    within the watermark window (state is bounded by the watermark,
    unlike a plain dropDuplicates which keeps keys forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _update_running(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState worker: per-user running totals.

    Arrow-batched custom stateful operator — the escape hatch for
    semantics Spark's built-in stateful ops can't express. State is one
    (n, total) pair per user: O(users) not O(events).
    """
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": total}]
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: cumulative per-user event count/value,
    emitted once per micro-batch per active user."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_RUNNING_FP_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_micros", T.LongType()),
    ]
)

_STATE_FP_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("micros", T.LongType()),
    ]
)


def _update_running_fixedpoint(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fixed-point twin of :func:`_update_running`: values accumulate as
    int64 micro-units (``floor(v·1e6 + 0.5)`` — exact for the
    non-negative event values), so the running total is independent of
    batch split and addition order — the property that makes the
    operator oracle-checkable bit-for-bit, and at scale makes replays
    and restarts reproduce identical state."""
    import numpy as np

    if state.exists:
        n, micros = state.get
    else:
        n, micros = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # floored values are integer-valued doubles < 2^53: the sum is
        # exact before the int64 conversion
        micros += int(np.floor(pdf["value"].to_numpy() * 1e6 + 0.5).sum())
    state.update((n, micros))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_micros": micros}]
    )


def user_running_totals_exact(events: DataFrame) -> DataFrame:
    """Custom stateful operator with order-free fixed-point state —
    cumulative per-user event count and micro-unit value total."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_fixedpoint,
        outputStructType=_RUNNING_FP_SCHEMA,
        stateStructType=_STATE_FP_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_events(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: attach a slowly-changing dimension to a
    stream.

    The static side is a plain batch DataFrame — Spark re-plans it per
    micro-batch (picking up dimension updates between batches) and
    broadcasts it when small, so the stream side never shuffles: this
    is the standard enrichment shape for feature/metadata lookup at
    ingest. Map-only per batch — no streaming state at all.
    """
    from pyspark.sql import functions as F

    return events.join(
        F.broadcast(dim), events.user_id == dim.c_custkey, "inner"
    ).select("event_id", "ts", "user_id", "event_type", "value", "c_mktsegment")


def view_click_attribution(
    events: DataFrame, bound: str = "2 hours", watermark: str = "4 hours"
) -> DataFrame:
    """Stream-stream inner join with an event-time bound: every click
    attributed to a same-user view at most ``bound`` earlier — the
    classic ad-attribution shape and the remaining major Structured
    Streaming surface (two *streaming* sides; ``enrich_events`` covers
    stream-static).

    State discipline: both sides carry watermarks and the join
    condition bounds click_ts to (view_ts, view_ts + bound], so Spark
    can drop buffered views once the click-side watermark passes
    view_ts + bound, and buffered clicks once the view-side watermark
    passes click_ts — state is O(events inside the watermark window),
    never O(stream). Inner-join rows emit in the micro-batch that
    matches them (no watermark wait), so an availableNow drain yields
    the complete batch-equal answer.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
            "user_id",
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("click_user"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {bound}")),
        "inner",
    ).select("view_id", "click_id", "user_id", "view_ts", "click_ts")
