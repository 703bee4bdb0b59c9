#!/usr/bin/env python
"""Soak the SCD2 CDC apply's bounded-cost claim: a FIXED change batch
applied to a 1x vs an 8x history must cost about the same wall time,
because both the read (touched-bucket partition pruning) and the
write (dynamic partition overwrite) are bounded by the batch's bucket
spread, not the accumulated history.

Histories are built from the orders table replicated with disjoint
custkey ranges (custkey + k * 10**7) — so the 8x history has 8x the
keys AND 8x the rows, but the probe batch touches the SAME 1000 base
keys in both. Buckets: 64 (so a 1000-key batch touches nearly all
buckets — the soak therefore measures the HONEST bound: per-bucket
file sizes grow 8x only for files the batch actually touches; the
win over an unpartitioned merge is the constant vs 8x growth of the
untouched remainder, reported as rewritten-bytes).

Prints one JSON line per scale: wall seconds of the apply +
bytes rewritten. Results recorded in SCALE.md.

Usage: python scripts/soak_scd2_sf1.py [copies]   (default 8)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators.scd import scd2_merge_batch
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.tables import load_table

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scd2_soak"
ID_STRIDE = 10**7
KW = dict(key="o_custkey", attr="o_orderpriority", ts="o_orderdate", seq="o_orderkey")
BUCKETS = 64
BATCH_KEYS = 1000


def history_changes(spark, copies: int):
    ch = load_table(spark, SRC_SF, "orders").select(*KW.values())
    parts = [
        ch.withColumn("o_custkey", F.col("o_custkey") + F.lit(k * ID_STRIDE))
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * ID_STRIDE))
        for k in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe_batch(spark, nkeys):
    """``nkeys`` base-range keys, one fresh change each, dated after
    the whole corpus (the non-decreasing-ts contract)."""
    return (
        load_table(spark, SRC_SF, "orders")
        .select("o_custkey")
        .distinct()
        .orderBy("o_custkey")
        .limit(nkeys)
        .select(
            "o_custkey",
            F.lit("Z-SOAK").alias("o_orderpriority"),
            F.lit("2031-01-01 00:00:00").cast("timestamp").alias("o_orderdate"),
            (F.col("o_custkey") + F.lit(9 * ID_STRIDE)).alias("o_orderkey"),
        )
    )


def dir_bytes(path):
    return sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark()
    for n in (1, copies):
        path = os.path.join(OUT, f"hist_{n}x")
        shutil.rmtree(path, ignore_errors=True)
        scd2_merge_batch(spark, path, history_changes(spark, n), **KW,
                         partitions=BUCKETS)
        total = dir_bytes(path)
        for nkeys in (BATCH_KEYS, 10):
            batch = probe_batch(spark, nkeys)
            before = {
                p: os.stat(p).st_mtime_ns
                for p in glob.glob(
                    os.path.join(path, "**", "*.parquet"), recursive=True
                )
            }
            t0 = time.time()
            scd2_merge_batch(spark, path, batch, **KW, partitions=BUCKETS)
            wall = time.time() - t0
            rewritten = sum(
                os.path.getsize(p)
                for p in glob.glob(
                    os.path.join(path, "**", "*.parquet"), recursive=True
                )
                if before.get(p) != os.stat(p).st_mtime_ns
            )
            print(
                json.dumps(
                    {
                        "scale": f"{n}x",
                        "history_bytes": total,
                        "apply_wall_s": round(wall, 2),
                        "rewritten_bytes": rewritten,
                        "batch_keys": nkeys,
                        "buckets": BUCKETS,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
