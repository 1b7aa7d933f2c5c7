"""Structured Streaming tests: run each streaming operator with
availableNow over the events data and check results against batch
equivalents."""

from __future__ import annotations

import os

import pytest

from spark_sql_server_spark.session import load_table
from spark_sql_server_spark.streaming import (
    events_stream,
    hourly_event_counts,
    sessionized_events,
    stream_dedup,
    user_running_totals,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Streaming file source needs a directory of parquet files —
    re-shard the events table into one."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMOKE, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def run_to_memory(spark, sdf, name: str, output_mode: str = "append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_hourly_counts_match_batch(spark, events_dir):
    # complete mode: emit every window at end-of-input (append mode only
    # emits windows the final watermark has passed — the tail hours of a
    # bounded replay never close)
    stream = events_stream(spark, events_dir)
    out = run_to_memory(
        spark, hourly_event_counts(stream), "hourly_counts", "complete"
    )
    got = {
        (r.hour, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in out.collect()
    }
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            __import__("pyspark.sql.functions", fromlist=["window"]).window(
                "ts", "1 hour"
            ).alias("w"),
            "event_type",
        )
        .count()
        .collect()
    )
    expected_keys = {(r.w.start, r.event_type) for r in batch}
    # availableNow + watermark: every window closes by end-of-input
    assert set(got) == expected_keys
    counts = {(r.w.start, r.event_type): r["count"] for r in batch}
    for k, (n, _) in got.items():
        assert counts[k] == n


def test_sessionization_stream(spark, events_dir):
    stream = events_stream(spark, events_dir)
    out = run_to_memory(spark, sessionized_events(stream), "sessions", "complete")
    rows = out.collect()
    assert rows, "session windows should close under availableNow"
    # sanity: session bounds ordered, counts positive
    for r in rows:
        assert r.session_start <= r.session_end
        assert r.n_events >= 1
    # per-user total events preserved
    total = sum(r.n_events for r in rows)
    assert total == load_table(spark, SF_SMOKE, "events").count()


def test_stream_dedup_drops_replay(spark, events_dir, tmp_path):
    # replay the same files twice → duplicates by event_id
    import shutil

    d = str(tmp_path / "dup_events")
    os.makedirs(d)
    for f in os.listdir(events_dir):
        if f.endswith(".parquet"):
            shutil.copy(f"{events_dir}/{f}", f"{d}/a_{f}")
            shutil.copy(f"{events_dir}/{f}", f"{d}/b_{f}")
    stream = events_stream(spark, d)
    out = run_to_memory(spark, stream_dedup(stream), "deduped", "append")
    n_unique = load_table(spark, SF_SMOKE, "events").count()
    assert out.count() == n_unique


def test_checkpoint_recovery_no_reprocessing(spark, events_dir, tmp_path):
    """Exactly-once across restarts: run with a checkpoint, stop, add
    new input, restart from the same checkpoint — only the new file is
    processed (the sum of emitted counts equals total rows, no dupes)."""
    import shutil

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    files = sorted(f for f in os.listdir(events_dir) if f.endswith(".parquet"))
    shutil.copy(f"{events_dir}/{files[0]}", f"{src}/{files[0]}")

    def run_passthrough():
        q = (
            events_stream(spark, src)
            .select("event_id", "event_type")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_passthrough()
    first_count = spark.read.parquet(sink).count()
    assert first_count > 0

    shutil.copy(f"{events_dir}/{files[1]}", f"{src}/{files[1]}")
    run_passthrough()
    total = spark.read.parquet(sink).count()
    expected = spark.read.parquet(f"{src}/{files[0]}").count() + spark.read.parquet(
        f"{src}/{files[1]}"
    ).count()
    # no reprocessing of the first file on restart
    assert total == expected
    # and all ids are distinct (no duplicates introduced by the restart)
    assert spark.read.parquet(sink).select("event_id").distinct().count() == total


def test_user_running_totals_stateful(spark, events_dir):
    stream = events_stream(spark, events_dir)
    out = run_to_memory(
        spark, user_running_totals(stream), "running_totals", "update"
    )
    # final state per user (last emit) must equal the batch totals
    from pyspark.sql import functions as F

    final = (
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("total_value").alias("v"))
        .collect()
    )
    batch = {
        r.user_id: (r.n, round(r.v, 6))
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v"))
        .collect()
    }
    got = {r.user_id: (r.n, round(r.v, 6)) for r in final}
    assert got == batch
