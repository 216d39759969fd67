"""Benchmark runner: executes every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line with per-query and
total wall-clock seconds.

Each query is forced with a count() action (no driver-side collect of the
result payload — we time the distributed plan, not Arrow transfer).

stdout discipline: the JSON line must be the ONLY thing on stdout (the
round-1 driver recorded ``"parsed": null`` because JVM/warning noise shares
the stream). fd 1 is redirected into stderr for the whole run — including
anything the JVM child process writes — and the JSON goes to a dup of the
original stdout saved before the redirect.

Size discipline: the round-2 driver ALSO recorded ``"parsed": null`` because
the one-line JSON for 87 queries (~4 KB) overflowed the driver's stdout tail
capture, truncating the head of the object. The stdout line is therefore a
compact summary (total, sf, n, the 10 slowest queries); the full per-query
timing map is written to BENCH_FULL.json next to this script."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kf_task_fhir_etl_spark import queries as q
from kf_task_fhir_etl_spark.session import get_spark


def main() -> None:
    real_stdout_fd = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)  # JVM + python stdout noise → stderr
    sys.stdout = sys.stderr
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    spark = get_spark("kf_task_fhir_etl_spark-bench")

    timings: dict[str, float] = {}
    registry = q.queries()
    # Opt-in subset filter for optimization-loop measurement (the driver
    # never sets this — default behavior is identical): comma-separated
    # name substrings, e.g. SPARK_GRAFT_BENCH_ONLY=q159,q153.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        subs = [s for s in only.split(",") if s]
        registry = {n: f for n, f in registry.items() if any(s in n for s in subs)}
    # Warm the JVM/session on the smallest SF so q1 doesn't absorb startup
    # cost. Three representative queries cover the three execution regimes
    # whose first run pays one-time setup that is NOT per-query cost:
    # codegen'd relational plans, interpreted higher-order functions
    # (~4 s of expression-interpreter JIT, measured on q89's n-gram
    # metrics), and Arrow/Python-worker spin-up for pandas kernels.
    for warm in ("q01_pricing_summary", "q89_quality_filter_funnel", "q15_embedding_neardup"):
        if warm in registry:
            registry[warm](spark, "/root/testdata/sf0.001").count()

    # ≥3 runs per query, reported value = per-query MEDIAN (r03 verdict
    # item: single-run timings made round-over-round deltas single-sample
    # noise on a shared host; the ±20% host-load band needs a median).
    # Re-running is safe for every gate: streaming memory sinks re-register
    # under the same queryName, the rollup store's replay guard skips
    # committed batches, and the bucketed tables skip-on-exists.
    runs_per_query = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    # Queries whose construction is memoized per session (etl.run_pipeline
    # memo_key): run 1 is the honest COLD cost, later runs measure the
    # resident-driver warm re-serve. Their per-run split is reported
    # explicitly and the headline total is published BOTH ways (r05 verdict
    # #5: the r04→r05 "improvement" was silently this accounting change;
    # cold/warm must never blend into one number again). Memoization is
    # DETECTED via etl.MEMO_HIT_COUNT around the repeat runs — a hardcoded
    # name set would silently miss the next memo_key adopter and re-blend
    # the accounting (r06 review).
    from kf_task_fhir_etl_spark import etl

    memoized_names: set[str] = set()
    all_runs: dict[str, list[float]] = {}
    total_start = time.perf_counter()
    warm_first_run: set[str] = set()
    for name in sorted(registry):
        rs = []
        hits_before_run1 = etl.MEMO_HIT_COUNT
        for i in range(runs_per_query):
            if i == 1:
                hits_before_reruns = etl.MEMO_HIT_COUNT
            start = time.perf_counter()
            registry[name](spark, sf_dir).count()
            rs.append(round(time.perf_counter() - start, 3))
        all_runs[name] = rs
        if runs_per_query > 1 and etl.MEMO_HIT_COUNT > hits_before_reruns:
            memoized_names.add(name)
            # a memoized gate whose run 1 ALSO hit (another gate populated
            # its group first) has no cold run to report — publishing its
            # warm run 1 as "cold" would understate value_cold (r06 review)
            if hits_before_reruns > hits_before_run1:
                warm_first_run.add(name)
            # warm runs ONLY: median(all runs) with an even run count
            # averages cold into the "warm" headline (r06 review); `value`
            # must be purely warm for memoized gates, `value_cold` carries
            # run 1
            timings[name] = round(statistics.median(rs[1:]), 3)
        else:
            timings[name] = round(statistics.median(rs), 3)
    wall = round(time.perf_counter() - total_start, 3)
    total = round(sum(timings.values()), 3)
    memoized = {
        name: {
            # None when run 1 itself served from a memo another gate
            # populated — there is no honest cold number for this gate
            "cold": None if name in warm_first_run else all_runs[name][0],
            "warm_median": (
                round(statistics.median(all_runs[name][1:]), 3)
                if len(all_runs[name]) > 1
                else None
            ),
        }
        for name in sorted(memoized_names & set(timings))
    }
    # headline with every memoized query counted at its COLD run instead of
    # the (warm-dominated) median; gates with no cold run stay at warm
    total_cold = round(
        total
        + sum(
            m["cold"] - timings[n] for n, m in memoized.items() if m["cold"] is not None
        ),
        3,
    )

    spark.stop()
    here = os.path.dirname(os.path.abspath(__file__))
    # a filtered run must never clobber the committed full artifact
    full_path = os.path.join(here, "BENCH_SUBSET.json" if only else "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "value_cold": total_cold,
                "unit": "sec",
                "queries": timings,
                "memoized": memoized,
                "runs_per_query": runs_per_query,
                "runs": all_runs,
                "wall_clock_all_runs": wall,
                "sf": sf,
            },
            f,
            indent=1,
        )
        f.write("\n")
    # per-round archive (r04 verdict item #7: BENCH_FULL histories should be
    # files, not git archaeology): SPARK_GRAFT_BENCH_TAG=r05 writes an
    # immutable copy next to the live artifact
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG")
    if tag:
        import shutil

        from kf_task_fhir_etl_spark.catalog import sanitize_tag

        shutil.copyfile(
            full_path, os.path.join(here, f"BENCH_FULL_{sanitize_tag(tag)}.json")
        )
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    with os.fdopen(real_stdout_fd, "w") as out:
        out.write(
            json.dumps(
                {
                    "metric": "total_query_wall_clock",
                    "value": total,
                    "value_cold": total_cold,
                    "unit": "sec",
                    "sf": sf,
                    "n_queries": len(timings),
                    "queries": slowest,
                    "full": "BENCH_FULL.json",
                }
            )
            + "\n"
        )


if __name__ == "__main__":
    main()
