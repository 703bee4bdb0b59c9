#!/usr/bin/env python
"""Decompose a query's wall into CONSTRUCTION (python/py4j DataFrame
build), PLANNING (explain cost on the built frame), and EXECUTION
(count on a pre-built frame), steady-state (min of N after a warm
run). Round-15 profiling tool (guide §1): tells whether a slow query
needs §7.3 driver-side work or §2 plan work.

Usage: python scripts/profile_decompose.py q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))


def main() -> None:
    import __spark_entry__ as entry_mod
    from map_reduce_rpc_spark.session import get_spark

    qs = entry_mod.queries()
    spark = get_spark("profile_decompose")
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    for name in sys.argv[1:]:
        fn = qs[name]
        # warm (cold machinery, caches) outside any timing
        try:
            fn(spark, SF_DIR).count()
        except Exception as exc:
            print(f"{name}: ERROR {exc}")
            continue
        cons, plan, ex, tot = [], [], [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            cons.append(t1 - t0)
            plan.append(t2 - t1)
            ex.append(t3 - t2)
            tot.append(t3 - t0)
        jobs0 = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        print(
            f"{name}: total {min(tot):.3f}s = construct {min(cons):.3f}"
            f" + plan {min(plan):.3f} + exec {min(ex):.3f}"
            f"  (n_jobs_session={len(jobs0)})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
