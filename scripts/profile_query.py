#!/usr/bin/env python
"""Per-query job/stage/task profiler for the optimization rounds.

For each named query (or the N slowest from bench_results.json):
warm-run once, then a timed run wrapped in a job group, and report
wall seconds plus how many Spark JOBS (actions), STAGES, and TASKS
the run launched — the decomposition guide §1 asks for. At sf0.1 the
corpus is 17 MB, so wall time is dominated by per-job/stage fixed
overhead: a query at 3 s / 25 jobs is overhead-bound (fix: fewer
actions — lazy checkpoints, fused passes), while 3 s / 4 jobs is
plan-bound (fix: fewer exchanges / narrower shuffles).

Usage: python scripts/profile_query.py q1 q2 ...   (or --top N)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as entry_mod
    from map_reduce_rpc_spark.session import get_spark

    qs = entry_mod.queries()
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--top" in sys.argv:
        n = int(sys.argv[sys.argv.index("--top") + 1])
        with open(
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "bench_results.json")
        ) as fh:
            per_q = json.load(fh)["per_query_sec"]
        names = [k for k, _ in sorted(per_q.items(), key=lambda kv: -kv[1])[:n]]
    if not names:
        print("usage: profile_query.py <query>... | --top N", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("profile")
    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    tracker = jsc.statusTracker()
    results = {}
    for name in names:
        fn = qs[name]
        try:
            fn(spark, SF_DIR).count()  # warm
            sc.setJobGroup(name, name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            # driver-side analysis+optimization+physical planning only
            # (pre-AQE): how much of the wall is single-threaded
            # Catalyst work (guide §7.3) vs execution
            df._jdf.queryExecution().executedPlan()
            t_plan = time.perf_counter() - t0
            df.count()
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            job_ids = tracker.getJobIdsForGroup(name)
            n_jobs = len(job_ids)
            n_stages = 0
            n_tasks = 0
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info.isEmpty():
                    continue
                for sid in info.get().stageIds():
                    si = tracker.getStageInfo(sid)
                    if not si.isEmpty():
                        n_stages += 1
                        n_tasks += si.get().numTasks()
            results[name] = {
                "sec": round(dt, 3),
                "plan_sec": round(t_plan, 3),
                "jobs": n_jobs,
                "stages": n_stages,
                "tasks": n_tasks,
            }
            print(
                f"{name:38s} {dt:7.3f}s (plan {t_plan:6.3f}s)  jobs={n_jobs:3d} "
                f"stages={n_stages:3d} tasks={n_tasks:5d}",
                flush=True,
            )
        except Exception as exc:
            print(f"{name}: ERROR {exc}", flush=True)
    print(json.dumps(results, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
