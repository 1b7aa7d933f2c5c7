#!/usr/bin/env python
"""Scan census over ALL registry operators (r12 VERDICT item 6).

For every operator, build its DataFrame inside the real harness
(`build_session`, default sf0.01) and count `Scan parquet` nodes in the
executed plan. The r12 census ran this driver-side for 239/250 ops; the
streaming `st_*` family and the first-pandas-UDF ops errored outside
their harness. This version runs every op with a per-op try/except and,
for the streaming drains (whose *returned* frame is a post-drain
localCheckpoint with no parquet scans), additionally records the
streaming source reads observed by a StreamingQueryListener — so the
sweep genuinely covers 250/250.

Usage: python tools/scan_census.py [sf_dir] [> census.json]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_server_spark.operators import REGISTRY  # noqa: E402
from spark_sql_server_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = build_session(app_name="scan-census")

    # streaming-source observation: availableNow drains finish before
    # the operator function returns, so a listener sees every batch
    from pyspark.sql.streaming import StreamingQueryListener

    stream_batches: list[dict] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            stream_batches.append(
                {
                    "sources": len(p.sources),
                    "numInputRows": p.numInputRows,
                    "state_rows": sum(
                        s.numRowsTotal for s in (p.stateOperators or [])
                    ),
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _L()
    spark.streams.addListener(listener)

    out: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        stream_batches.clear()
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_scans = plan.count("Scan parquet")
            entry: dict = {"scans": n_scans}
            if stream_batches:
                entry["streaming_batches"] = len(stream_batches)
                entry["streaming_sources"] = max(
                    b["sources"] for b in stream_batches
                )
                entry["note"] = (
                    "returned frame is the post-drain checkpoint; source "
                    "reads observed via listener"
                )
            out[name] = entry
        except Exception as e:  # noqa: BLE001 — census must finish
            out[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# {name}: {out[name]}", file=sys.stderr)

    spark.streams.removeListener(listener)
    n_err = sum(1 for v in out.values() if "error" in v)
    summary = {
        "sf_dir": sf_dir,
        "n_ops": len(out),
        "n_errors": n_err,
        "ge4_scans": sorted(
            n for n, v in out.items() if v.get("scans", 0) >= 4
        ),
        "ops": out,
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
