#!/usr/bin/env python
"""State-size / throughput micro-bench for the stateful streaming ops
(r12 VERDICT item 7): st_dedup_stream, st_running_totals,
st_stream_stream_join.

Each pipeline is driven through the SAME transformation helpers the
registered operators use (`spark_sql_server_spark.streaming.pipeline`),
over the same replayed events source, at two input rates:

- rate "bulk":   availableNow with no file cap — one big micro-batch
  (how the registered operator drains);
- rate "paced":  maxFilesPerTrigger=1 — one source file per micro-batch
  (8 batches for the dedup replay, 4 for the others).

A StreamingQueryListener records, per micro-batch: input rows, batch
wall (triggerExecution ms), rows/sec, and the state store's
numRowsTotal / memoryUsedBytes — the scale-relevant numbers (state must
stay watermark-bounded, not O(stream)).

Usage: python tools/stream_microbench.py [sf_dir] > STREAM_BENCH.json
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_server_spark.session import build_session, load_table  # noqa: E402
from spark_sql_server_spark.streaming.pipeline import (  # noqa: E402
    EVENTS_SCHEMA,
    stream_dedup,
    user_running_totals_exact,
    view_click_attribution,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="stream-microbench")

    from pyspark.sql.streaming import StreamingQueryListener

    batches: list[dict] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            dur = (p.durationMs or {}).get("triggerExecution", 0)
            batches.append(
                {
                    "numInputRows": p.numInputRows,
                    "batch_ms": dur,
                    "rows_per_sec": round(p.numInputRows / (dur / 1e3), 1)
                    if dur
                    else None,
                    "state_rows": sum(
                        s.numRowsTotal for s in (p.stateOperators or [])
                    ),
                    "state_bytes": sum(
                        s.memoryUsedBytes for s in (p.stateOperators or [])
                    ),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _L()
    spark.streams.addListener(listener)

    def run(label: str, build, src: str, rate: str, mode: str) -> dict:
        batches.clear()
        reader = spark.readStream.schema(EVENTS_SCHEMA)
        if rate == "paced":
            reader = reader.option("maxFilesPerTrigger", 1)
        stream = reader.parquet(src)
        sink = f"mb_{uuid.uuid4().hex[:8]}"
        q = (
            build(stream)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        out_rows = spark.table(sink).count()
        spark.catalog.dropTempView(sink)
        data = [b for b in batches if b["numInputRows"] > 0] or batches
        return {
            "rate": rate,
            "n_batches": len(data),
            "out_rows": out_rows,
            "total_input_rows": sum(b["numInputRows"] for b in data),
            "peak_state_rows": max((b["state_rows"] for b in data), default=0),
            "peak_state_bytes": max(
                (b["state_bytes"] for b in data), default=0
            ),
            "batches": data,
        }

    results: dict[str, list] = {}

    # sources mirror the registered operators' setup exactly
    ev = load_table(spark, sf_dir, "events").repartition(4)

    src_dedup = tempfile.mkdtemp(prefix="mb-dedup-")
    ev.write.mode("overwrite").parquet(src_dedup)
    ev.write.mode("append").parquet(src_dedup)  # at-least-once replay
    results["st_dedup_stream"] = [
        run("dedup", stream_dedup, src_dedup, rate, "append")
        for rate in ("bulk", "paced")
    ]

    src_plain = tempfile.mkdtemp(prefix="mb-plain-")
    ev.write.mode("overwrite").parquet(src_plain)
    results["st_running_totals"] = [
        run("totals", user_running_totals_exact, src_plain, rate, "update")
        for rate in ("bulk", "paced")
    ]
    results["st_stream_stream_join"] = [
        run("attrib", view_click_attribution, src_plain, rate, "append")
        for rate in ("bulk", "paced")
    ]

    spark.streams.removeListener(listener)
    shutil.rmtree(src_dedup, ignore_errors=True)
    shutil.rmtree(src_plain, ignore_errors=True)
    print(json.dumps({"sf_dir": sf_dir, "ops": results}, indent=1))


if __name__ == "__main__":
    main()
