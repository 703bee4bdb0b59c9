#!/usr/bin/env python
"""sf1-scale soak of the round-5 TPC-H subquery shapes.

Replicates the sf0.1 FACT tables (orders, lineitem) 10x with strided
order keys while keeping every dimension at its original cardinality —
the realistic growth axis (more orders against the same customers /
suppliers / parts) and the harder one for the new shapes:

- q21_waiting_suppliers: the late slice and both correlated self-joins
  scale with lineitem (3 shuffles on orderkey) — expect ~linear wall.
- q8_market_share: the widest join tree; the single fact-fact shuffle
  scales linearly, every dimension stays broadcast — expect ~linear.
- q2_min_cost_supplier: per-(part, supplier) aggregate has FIXED group
  cardinality, so the exchanges carry the same bytes at any size —
  expect SUB-linear (scan-dominated).
- q20_dominant_suppliers: same fixed-cardinality aggregate argument.
- q5_local_supplier_volume: one orderkey shuffle — expect ~linear.

Prints one JSON line per measurement; results recorded in SCALE.md.

Usage: python scripts/soak_tpch_sf1.py [copies]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.plans import relational
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.tables import load_table

SRC_SF = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/spark_graft_soak_tpch"
KEY_STRIDE = 10_000_000  # far above any sf0.1 o_orderkey

DIMS = ("region", "nation", "customer", "supplier", "part")

QUERIES = [
    ("q21_waiting_suppliers", relational.q21_waiting_suppliers),
    ("q8_market_share", relational.q8_market_share),
    ("q2_min_cost_supplier", relational.q2_min_cost_supplier),
    ("q20_dominant_suppliers", relational.q20_dominant_suppliers),
    ("q5_local_supplier_volume", relational.q5_local_supplier_volume),
]


def build(spark, copies: int) -> str:
    marker = os.path.join(OUT_DIR, ".built")
    if os.path.exists(marker) and open(marker).read().strip() == str(copies):
        return OUT_DIR
    if os.path.exists(marker):
        os.remove(marker)
    os.makedirs(OUT_DIR, exist_ok=True)
    k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k")
    stride = F.col("k").cast("long") * F.lit(KEY_STRIDE).cast("long")
    orders = load_table(spark, SRC_SF, "orders")
    orders.select("*", k).select(
        (F.col("o_orderkey") + stride).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(os.path.join(OUT_DIR, "orders.parquet"))
    li = load_table(spark, SRC_SF, "lineitem")
    li.select("*", k).select(
        (F.col("l_orderkey") + stride).alias("l_orderkey"),
        "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ).write.mode("overwrite").parquet(os.path.join(OUT_DIR, "lineitem.parquet"))
    for d in DIMS:
        load_table(spark, SRC_SF, d).write.mode("overwrite").parquet(
            os.path.join(OUT_DIR, f"{d}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write(str(copies))
    return OUT_DIR


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("soak_tpch_sf1")
    big = build(spark, copies)
    for label, sf_dir in [("sf0.1", SRC_SF), (f"{copies}x", big)]:
        for name, fn in QUERIES:
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            print(
                json.dumps(
                    {"op": name, "corpus": label, "rows": n,
                     "wall_s": round(time.time() - t0, 2)}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
