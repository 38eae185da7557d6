#!/usr/bin/env python
"""Capture .explain("formatted") for every registry query into
plans/r13/<query>_<tag>.txt (tag = before/after).

Usage: python scripts/capture_plans.py <tag> [query ...]

Plans are captured at the bench scale factor dir ($SPARK_GRAFT_SF_DIR,
default sf0.1) so PushedFilters / join strategies reflect what the
bench actually runs.  Queries whose body *executes* work as a side
effect (index lifecycles, streaming) still produce a plan for the
returned DataFrame — the judged artifact is the final shape.
"""

from __future__ import annotations

import os
import sys
import traceback


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)

    from pedsnetdcc_spark.queries import QUERIES
    from pedsnetdcc_spark.session import build_session

    spark = build_session(app_name="plan_capture")
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")
            )
        except Exception:
            plan = "PLAN CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"captured {name} -> {path}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
