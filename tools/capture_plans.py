#!/usr/bin/env python
"""Capture .explain("formatted") for bench queries into plans/r12/.

Usage: python tools/capture_plans.py <suffix> [name1,name2,...]

Writes plans/r12/<query>_<suffix>.txt for each bench=True registry entry
(or the explicit name list). Driver-only work except for operators that
eagerly localCheckpoint during construction.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sql_server_spark.operators import REGISTRY  # noqa: E402
from spark_sql_server_spark.session import build_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = None
    if len(sys.argv) > 2:
        names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get(
        "PLANS_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "plans",
            "r13",
        ),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = build_session(app_name="plan-capture")
    targets = names or [n for n, s in REGISTRY.items() if s.bench]
    for name in targets:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # capture the failure instead of dying
            text = f"ERROR building {name}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        joins = sorted(
            {w for w in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                          "BroadcastNestedLoopJoin", "CartesianProduct") if w in text}
        )
        pyeval = sorted(
            {w for w in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                          "FlatMapGroupsInPandas", "MapInArrow") if w in text}
        )
        print(f"{name}: Exchange={n_exch} joins={joins} py={pyeval}", file=sys.stderr)


if __name__ == "__main__":
    main()
