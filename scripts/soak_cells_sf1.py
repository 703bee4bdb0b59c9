#!/usr/bin/env python
"""sf1 soak: the k ∝ N contract of cell-blocked semantic dedup,
measured (round 8).

The sf1 full-registry checkpoint caught the registry's three
vector-dedup queries superlinear (embedding_near_dups exp 1.29,
semantic_dedup 1.25, semantic_dedup_cells 1.15, isolated min-of-3):
their CERTIFICATION shape pins the block structure (label blocks =
10 fixed; SEMDEDUP_CELLS_K = 8 fixed) so the DuckDB oracle can
replay it, and with a FIXED block count 10x data means 10x block
size means 100x within-block candidate pairs. That is not the
production shape: SCALE.md's contract is k GROWS WITH N so cell
size (~n/k) stays bounded and total pair work stays linear.

This soak runs the full cells pipeline (fit -> assign -> blocked
pairs -> within-block closure -> keepers) at sf1 (20k vectors) with
k=8 (the frozen certification parameter) vs k=80 (k ∝ N: the same
~250-vector cells the certified query has at sf0.1) and prints wall
seconds + pair counts for both. Expected and confirmed: k=80 returns
the within-cell quadratic term to its sf0.1 scale, so wall time is
~linear-in-N overall.

Usage: python scripts/soak_cells_sf1.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators import similarity
from map_reduce_rpc_spark.operators.graph import components_within_blocks
from map_reduce_rpc_spark.plans.vectors import (
    SEMDEDUP_CELLS_ITERS,
    SEMDEDUP_THRESHOLD,
    _fit_centroids,
)
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.tables import load_table

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"


def run_cells(spark, sf_dir: str, k: int) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    t0 = time.perf_counter()
    cents = _fit_centroids(emb, f"{sf_dir}#k{k}", k, SEMDEDUP_CELLS_ITERS)
    celled = similarity.assign_cells(emb, cents)
    pairs = similarity.blocked_near_dup_pairs(
        celled,
        threshold=SEMDEDUP_THRESHOLD,
        block_col="cell",
        keep_block_col=True,
    )
    comp = components_within_blocks(pairs, block_col="blk").select(
        F.col("node").alias("vec_id"), F.col("component")
    )
    keepers = (
        emb.select("vec_id")
        .join(comp, "vec_id", "left")
        .select(
            F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
        )
    )
    n_components = keepers.distinct().count()
    wall = time.perf_counter() - t0
    n_pairs = pairs.count()
    return {
        "k": k,
        "wall_sec": round(wall, 2),
        "pairs": n_pairs,
        "components": n_components,
    }


def main() -> None:
    spark = get_spark("soak_cells_sf1")
    n = load_table(spark, SF1, "embeddings").count()
    out = {"sf1_dir": SF1, "n_vectors": n, "runs": []}
    for k in (8, 80):
        r = run_cells(spark, SF1, k)
        out["runs"].append(r)
        print(f"  k={k}: {r['wall_sec']}s pairs={r['pairs']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
