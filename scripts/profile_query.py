"""Profile one registry query via the Spark event log (the UI is disabled).

Usage:
    python scripts/profile_query.py <name_substr> [runs]

Runs the selected quer(ies) with `.count()` (the bench action), then parses
the event log into a per-job wall-clock breakdown (job description, duration,
stages, shuffle bytes, task time) — the guide §1 empirical loop without a UI.
Optimization-loop tooling only; never invoked by the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-profile"


def main() -> int:
    name_substr = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)  # Spark 4 writes eventlog_v2 DIRS
    os.makedirs(EVDIR, exist_ok=True)
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true --conf spark.eventLog.dir={EVDIR} "
        "--conf spark.eventLog.compress=false "
        "pyspark-shell"
    )

    from kf_task_fhir_etl_spark import queries as q
    from kf_task_fhir_etl_spark.session import get_spark

    spark = get_spark("profile")
    registry = {n: f for n, f in q.queries().items() if name_substr in n}
    if not registry:
        print(f"no query matches {name_substr!r}")
        return 1
    for name, fn in sorted(registry.items()):
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"RUN{i}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            print(f"== {name} run {i}: {time.perf_counter() - t0:.3f}s", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    spark.stop()

    # ---- parse the event log ------------------------------------------------
    ev_files = []
    for root, _dirs, files in os.walk(EVDIR):
        ev_files.extend(
            os.path.join(root, f) for f in files if not f.startswith("appstatus")
        )
    jobs: dict[int, dict] = {}
    stage_of_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    for path in ev_files:
        with open(path) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                t = e.get("Event")
                if t == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    jobs[jid] = {
                        "t0": e["Submission Time"],
                        "desc": e.get("Properties", {}).get(
                            "spark.job.description", ""
                        ),
                        "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                    }
                    for s in e.get("Stage Infos", []):
                        stage_of_job[s["Stage ID"]] = jid
                elif t == "SparkListenerJobEnd":
                    jid = e["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = e["Completion Time"]
                elif t == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    stages[si["Stage ID"]] = {
                        "name": si["Stage Name"].split("\n")[0][:70],
                        "tasks": si["Number of Tasks"],
                    }

    rows = []
    for jid, j in sorted(jobs.items()):
        if "t1" not in j:
            continue
        dur = (j["t1"] - j["t0"]) / 1000.0
        sdesc = ",".join(
            f"{sid}:{stages.get(sid, {}).get('name', '?')}[{stages.get(sid, {}).get('tasks', '?')}]"
            for sid in j["stages"]
            if sid in stages
        )
        rows.append((dur, jid, j["desc"], sdesc))
    print("\n---- jobs by duration ----")
    for dur, jid, desc, sdesc in sorted(rows, reverse=True)[:40]:
        print(f"{dur:7.3f}s  job{jid:<4} {desc[:48]:48} {sdesc[:100]}")
    by_desc: dict[str, float] = {}
    n_by_desc: dict[str, int] = {}
    for dur, _, desc, _ in rows:
        by_desc[desc] = by_desc.get(desc, 0.0) + dur
        n_by_desc[desc] = n_by_desc.get(desc, 0) + 1
    print("\n---- total by description ----")
    for desc, tot in sorted(by_desc.items(), key=lambda kv: -kv[1]):
        print(f"{tot:8.3f}s  {n_by_desc[desc]:4d} jobs  {desc[:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
