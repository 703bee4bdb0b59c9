#!/usr/bin/env python
"""sf1-scale soak of the graph family (PageRank, k-core, LPA,
triangles, personalized PageRank) along BOTH growth axes:

- DENSE (copies x facts, same entity keys): orders/lineitem replicated
  10x with strided order keys, customers/suppliers unchanged — the
  realistic axis for an entity graph over a bounded universe. Edge
  DERIVATION (the distinct over the fact join) scales with raw rows;
  the derived graph saturates, so iteration cost stays ~flat. This is
  the 100 TB shape: facts grow, the entity graph doesn't.
- WIDE (copies disjoint graph copies): custkey/suppkey strided too, so
  nodes AND edges grow 10x while per-node degree stays fixed — the
  axis that stresses the per-iteration join+agg itself. Expect
  ~linear wall per iteration; any superlinearity here is a real
  scaling bug (the supplier dimension is replicated with matching
  strided keys so rank->name joins stay total).

Prints one JSON line per measurement; results recorded in SCALE.md.

Usage: python scripts/soak_graph_sf1.py [copies]   (default 10)
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
OUT_DENSE = "/tmp/spark_graft_soak_graph_dense"
OUT_WIDE = "/tmp/spark_graft_soak_graph_wide"
ORDER_STRIDE = 10_000_000
CUST_STRIDE = 1_000_000
SUPP_STRIDE = 100_000

QUERIES = [
    ("pagerank_suppliers", relational.pagerank_suppliers),
    ("ppr_supplier_recs", relational.ppr_supplier_recs),
    ("kcore_suppliers", relational.kcore_suppliers),
    ("label_prop_communities", relational.label_prop_communities),
    ("triangle_count_suppliers", relational.triangle_count_suppliers),
]


def _build(spark, out: str, copies: int, wide: bool) -> str:
    marker = os.path.join(out, ".built")
    tag = f"{copies}:{wide}"
    if os.path.exists(marker) and open(marker).read().strip() == tag:
        return out
    if os.path.exists(marker):
        os.remove(marker)
    os.makedirs(out, exist_ok=True)
    k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("k")
    kc = F.col("k").cast("long")
    cust_off = kc * F.lit(CUST_STRIDE) if wide else F.lit(0).cast("long")
    supp_off = kc * F.lit(SUPP_STRIDE) if wide else F.lit(0).cast("long")
    orders = load_table(spark, SRC_SF, "orders")
    orders.select("*", k).select(
        (F.col("o_orderkey") + kc * F.lit(ORDER_STRIDE)).alias("o_orderkey"),
        (F.col("o_custkey") + cust_off).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    ).write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))
    li = load_table(spark, SRC_SF, "lineitem")
    li.select("*", k).select(
        (F.col("l_orderkey") + kc * F.lit(ORDER_STRIDE)).alias("l_orderkey"),
        "l_partkey",
        (F.col("l_suppkey") + supp_off).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ).write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
    supp = load_table(spark, SRC_SF, "supplier")
    if wide:
        others = [c for c in supp.columns if c != "s_suppkey"]
        supp = supp.select("*", k).select(
            (F.col("s_suppkey") + supp_off).alias("s_suppkey"), *others
        )
    supp.write.mode("overwrite").parquet(os.path.join(out, "supplier.parquet"))
    with open(marker, "w") as fh:
        fh.write(tag)
    return out


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("soak_graph_sf1")
    dense = _build(spark, OUT_DENSE, copies, wide=False)
    wide = _build(spark, OUT_WIDE, copies, wide=True)
    for label, sf_dir in [
        ("sf0.1", SRC_SF),
        (f"{copies}x-dense", dense),
        (f"{copies}x-wide", wide),
    ]:
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
