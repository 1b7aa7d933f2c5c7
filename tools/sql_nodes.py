#!/usr/bin/env python
"""Run a query once (after a warmup) and dump the SQL-tab node metrics.

Usage: python tools/sql_nodes.py <name> [warmups]

Prints every physical-plan node of the final (slowest) SQL execution with
its key metrics (rows, time, shuffle bytes) so the expensive operator is
identifiable — the REST equivalent of reading the SQL tab (guide §7.1).
"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_server_spark.operators import REGISTRY  # noqa: E402
from spark_sql_server_spark.session import build_session  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    warmups = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="sql-nodes", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    spec = REGISTRY[name]
    for i in range(warmups + 1):
        spark.sparkContext.setJobDescription(f"{name} run{i}")
        spec.fn(spark, sf_dir).count()

    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/sql?details=true&planDescription=false&length=1000"
    ) as r:
        execs = json.load(r)
    # executions of the LAST run (description contains runN)
    tag = f"{name} run{warmups}"
    mine = [e for e in execs if tag in (e.get("description") or "")]
    for e in mine:
        print(f"=== execution {e['id']} dur={e.get('duration')}ms  {e.get('description','')[:80]}")
        for n in e.get("nodes", []):
            ms = {m["name"]: m["value"] for m in n.get("metrics", [])}
            keep = {}
            for k, v in ms.items():
                lk = k.lower()
                if any(w in lk for w in ("time", "rows", "data size", "bytes", "spill")):
                    keep[k] = v
            line = "; ".join(f"{k}={v}" for k, v in sorted(keep.items()))
            print(f"  [{n['nodeId']:>3}] {n['nodeName'][:45]:45s} {line[:220]}")


if __name__ == "__main__":
    main()
