#!/usr/bin/env python
"""Benchmark harness — runs the headline queries and prints ONE JSON line.

Mirrors the reference's TPC-DS harness protocol (BASELINE.md): per-query
best/avg over N iterations with a warmup pass, on
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) with
``local[$SPARK_GRAFT_CPUS]``.

Output: {"metric": "headline_total_best_sec", "value": N, "unit":
"sec", "queries": {name: best_sec, ...}, "sf": 0.1}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_sql_server_spark.operators import REGISTRY  # noqa: E402
from spark_sql_server_spark.session import build_session  # noqa: E402

ITERS = int(os.environ.get("BENCH_ITERS", "3"))
WARMUP = 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = build_session(app_name="spark-pg-server-bench")

    bench_queries = {n: s for n, s in REGISTRY.items() if s.bench}
    results: dict[str, float] = {}
    details: dict[str, dict] = {}
    for name, spec in bench_queries.items():
        times = []
        rows = 0
        for i in range(WARMUP + ITERS):
            t0 = time.perf_counter()
            # count() forces a full execution without pulling rows to the
            # driver — same work the reference measures (executeCollect on
            # the server; transport excluded)
            rows = spec.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            if i >= WARMUP:
                times.append(dt)
        results[name] = round(min(times), 4)
        details[name] = {
            "best_sec": round(min(times), 4),
            "avg_sec": round(sum(times) / len(times), 4),
            "rows": rows,
        }
        print(f"# {name}: best={min(times):.3f}s avg={sum(times)/len(times):.3f}s rows={rows}",
              file=sys.stderr)

    total = round(sum(results.values()), 4)
    print(json.dumps({
        "metric": "headline_total_best_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "iters": ITERS,
        "detail": details,
    }))


if __name__ == "__main__":
    main()
