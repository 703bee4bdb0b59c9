#!/usr/bin/env python
"""sf1-scale soak of the as-of join family (round 5).

Reuses (or builds) the soak_streaming_sf1 replicated events corpus —
10x rows AND 10x user (key) cardinality, the honest worst case for an
operator whose shuffle is keyed on user_id. Times all three as-of
directions (backward / forward / nearest) end-to-end.

Expectation: near-linear wall. Every variant is the same union-and-fill
shape — ONE shuffle on the key plus per-partition sorts — so cost is
O(rows log rows/partition) with no pair blowup; nearest adds a second
in-partition sort (two window orders over one exchange), not a second
shuffle.

Prints one JSON line per measurement; results recorded in SCALE.md.

Usage: python scripts/soak_asof_sf1.py [copies]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
    asof_join_nearest,
)
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.tables import load_table
from soak_streaming_sf1 import SRC_SF, build


def split(ev):
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("pts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("cts"), "value"
    )
    return purchases, clicks


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("soak_asof_sf1")
    kw = dict(on="user_id", left_ts="pts", right_ts="cts", payload_cols=["value"])
    for label, sf_dir in [("sf0.1", SRC_SF), (f"{copies}x", build(spark, copies))]:
        ev = load_table(spark, sf_dir, "events")
        purchases, clicks = split(ev)
        for name, fn in [
            ("asof_backward", asof_join_backward),
            ("asof_forward", asof_join_forward),
            ("asof_nearest", asof_join_nearest),
        ]:
            fn(purchases, clicks, **kw).count()  # warm
            t0 = time.perf_counter()
            rows = fn(purchases, clicks, **kw).count()
            print(json.dumps({
                "op": name, "corpus": label,
                "sec": round(time.perf_counter() - t0, 2), "rows": rows,
            }))
    spark.stop()


if __name__ == "__main__":
    main()
