#!/usr/bin/env python
"""Skew-on/skew-off wall-clock measurement for the skew-sensitive
event operators (round-6 verdict item 4 — the performance half;
tests/test_skew.py is the correctness half).

Materializes TWO events tables in /tmp at ``copies``x the sf0.1 row
count (default 10x ~= sf1, ~1M rows), identical except for the user_id
distribution:

  uniform — the testdata's own user_id, replicated with disjoint
            event_id ranges (the skew-off control);
  zipf    — one user holds exactly 20% of ALL rows, remainder
            Zipf(s=1.2) over 500 users (tests/test_skew.py's map,
            applied after replication so the hot user spans copies).

Then times salted_user_counts / user_sessions / funnel_conversion on
each (1 warmup + min of 2 timed) and prints one JSON line with the
per-query skew/uniform ratio. Ratios near 1.0 mean the salting, the
pre-aggregated window keys, and the shrinking funnel joins absorb the
hot key; results are recorded in SCALE.md.

Usage: python scripts/skew_bench.py [copies]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_rpc_spark.plans import events  # noqa: E402
from map_reduce_rpc_spark.session import get_spark  # noqa: E402
from tests.test_skew import HOT_SHARE_MOD, ZIPF_S, ZIPF_USERS  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = (
    "salted_user_counts",
    "user_sessions",
    "user_sessions_skewproof",
    "funnel_conversion",
    # the per-user basket cap is the quadratic-term lever: without it
    # the hot user's pair blowup would dominate; with it the ratio
    # should stay near 1.0 (late round 7)
    "covisitation_lift",
)


def build_variants(copies: int, base: str) -> tuple[str, str]:
    t = pq.read_table(os.path.join(SRC, "events.parquet"))
    eid = np.asarray(t.column("event_id").to_pandas(), dtype=np.int64)
    parts = []
    for k in range(copies):
        shifted = eid + np.int64(k) * np.int64(10**12)
        parts.append(
            t.set_column(
                t.schema.get_field_index("event_id"),
                "event_id",
                pa.array(shifted),
            )
        )
    big = pa.concat_tables(parts)
    uni_dir = os.path.join(base, "uniform")
    zipf_dir = os.path.join(base, "zipf")
    os.makedirs(uni_dir, exist_ok=True)
    os.makedirs(zipf_dir, exist_ok=True)
    pq.write_table(big, os.path.join(uni_dir, "events.parquet"))

    # Same Zipf map as tests/test_skew.py, inlined over the big table.
    all_eid = np.asarray(big.column("event_id").to_pandas(), dtype=np.int64)
    hot = all_eid % HOT_SHARE_MOD == 0
    u = (
        (all_eid.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    ).astype(np.float64) / 2.0**32
    w = 1.0 / np.arange(1, ZIPF_USERS + 1, dtype=np.float64) ** ZIPF_S
    cdf = np.cumsum(w) / w.sum()
    new_user = np.where(hot, 0, np.searchsorted(cdf, u, side="right") + 1).astype(
        np.int64
    )
    skewed = big.set_column(
        big.schema.get_field_index("user_id"), "user_id", pa.array(new_user)
    )
    pq.write_table(skewed, os.path.join(zipf_dir, "events.parquet"))
    return uni_dir, zipf_dir


def time_query(spark, fn, sf_dir: str) -> float:
    fn(spark, sf_dir).count()  # warmup
    samples = []
    for _ in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return min(samples)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = "/tmp/skew_bench"
    shutil.rmtree(base, ignore_errors=True)
    uni_dir, zipf_dir = build_variants(copies, base)
    spark = get_spark("skew-bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_rows = spark.read.parquet(os.path.join(uni_dir, "events.parquet")).count()
    out: dict[str, object] = {"copies": copies, "n_rows": n_rows, "queries": {}}
    for qname in QUERIES:
        fn = getattr(events, qname)
        t_uni = time_query(spark, fn, uni_dir)
        t_zipf = time_query(spark, fn, zipf_dir)
        out["queries"][qname] = {
            "uniform_sec": round(t_uni, 3),
            "zipf_sec": round(t_zipf, 3),
            "ratio": round(t_zipf / t_uni, 3),
        }
        print(f"  {qname}: uniform {t_uni:.3f}s zipf {t_zipf:.3f}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
