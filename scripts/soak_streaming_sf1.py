#!/usr/bin/env python
"""sf1-scale soak of the streaming family (round 5).

Replicates the sf0.1 events table 10x (disjoint event_id ranges,
user_id offset per copy so state cardinality ALSO grows 10x — the
honest worst case for a stateful operator: state is O(users), so a
10x-user replay stresses the state store, not just throughput).

Measures the three heaviest stream queries end-to-end through the
same replay harness the bench uses (chunked file source, sentinel
watermark advance, AvailableNow). Expectation: near-linear wall —
micro-batch count is layout-bound (same chunk count), so the delta is
per-batch volume + state-store size, both linear.

Prints one JSON line per query; results recorded in SCALE.md.

Usage: python scripts/soak_streaming_sf1.py [copies]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.plans import streams
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.tables import load_table

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/spark_graft_sf1_events"
ID_STRIDE = 10**9
USER_STRIDE = 10**6


def build(spark, copies: int) -> str:
    path = os.path.join(OUT_DIR, "events.parquet")
    # ONE marker recording what the dir currently holds (a per-copies
    # marker would survive a rebuild at a different size and mislabel
    # the corpus: build 10x, build 2x, build 10x again would reuse the
    # 2x data while reporting copies=10).
    marker = os.path.join(OUT_DIR, ".built")
    if os.path.exists(marker) and open(marker).read().strip() == str(copies):
        return OUT_DIR
    if os.path.exists(marker):
        os.remove(marker)
    ev = load_table(spark, SRC_SF, "events")
    out = ev.withColumn(
        "k", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    ).select(
        (
            F.col("event_id").cast("long")
            + F.col("k").cast("long") * F.lit(ID_STRIDE).cast("long")
        ).alias("event_id"),
        "ts",
        (
            F.col("user_id").cast("long")
            + F.col("k").cast("long") * F.lit(USER_STRIDE).cast("long")
        ).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    out.write.mode("overwrite").parquet(path)
    with open(marker, "w") as fh:
        fh.write(str(copies))
    return OUT_DIR


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("soak_streaming_sf1")
    sf_dir = build(spark, copies)
    n = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    print(json.dumps({"op": "corpus", "events": n, "copies": copies}))

    for name, fn in [
        ("stream_stateful_sessions", streams.stream_stateful_sessions),
        ("stream_hourly_counts", streams.stream_hourly_counts),
        ("stream_click_attribution", streams.stream_click_attribution),
    ]:
        # warm run first (same steady-state discipline as bench.py)
        fn(spark, sf_dir).count()
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        print(json.dumps({
            "op": name, "sec": round(time.perf_counter() - t0, 2),
            "rows": rows,
        }))
    spark.stop()


if __name__ == "__main__":
    main()
