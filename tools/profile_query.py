#!/usr/bin/env python
"""Profile one or more bench queries: run N iters, dump per-stage metrics.

Usage: python tools/profile_query.py name1[,name2...] [iters]

Builds the bench session but WITH the Spark UI enabled, runs each query
(count() like bench.py plus an optional noop-sink timing), then scrapes
the REST status API for per-stage wall time / shuffle bytes / input
bytes so the expensive stage is identifiable (guide section 1/7).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_server_spark.operators import REGISTRY  # noqa: E402
from spark_sql_server_spark.session import build_session  # noqa: E402


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="profile-query", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    for name in names:
        spec = REGISTRY[name]
        sc = spark.sparkContext
        times = []
        for i in range(1 + iters):
            sc.setJobDescription(f"{name} iter{i}")
            t0 = time.perf_counter()
            rows = spec.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if i > 0:
                times.append(dt)
        sc.setJobDescription(None)
        print(f"== {name}: best={min(times):.3f}s avg={sum(times)/len(times):.3f}s rows={rows}")

    # stage metrics for the whole run
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete") as r:
        stages = json.load(r)

    def wall(s):
        try:
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
            t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t1 = datetime.strptime(s["completionTime"], fmt)
            return (t1 - t0).total_seconds()
        except Exception:
            return 0.0

    for s in stages:
        s["_wall"] = wall(s)
    stages.sort(key=lambda s: -s["_wall"])
    print(f"{'stageId':>7} {'wall_s':>7} {'runTime_s':>9} {'cpu_s':>7} {'in_MB':>7} {'shRd_MB':>8} {'shWr_MB':>8} {'tasks':>5}  desc | name")
    for s in stages[:40]:
        print(
            f"{s['stageId']:>7} {s['_wall']:>7.2f} {s['executorRunTime']/1e3:>9.2f} "
            f"{s.get('executorCpuTime',0)/1e9:>7.2f} "
            f"{s.get('inputBytes',0)/1e6:>7.1f} "
            f"{s.get('shuffleReadBytes',0)/1e6:>8.2f} "
            f"{s.get('shuffleWriteBytes',0)/1e6:>8.2f} "
            f"{s.get('numCompleteTasks',0):>5}  "
            f"{(s.get('description') or '')[:40]} | {(s.get('name') or '')[:60]}"
        )


if __name__ == "__main__":
    main()
