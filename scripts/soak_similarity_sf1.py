#!/usr/bin/env python
"""sf1-scale soak of the similarity family (VERDICT r3 item #7).

Same recipe as soak_dedup_sf1.py: replicate the sf0.1 embeddings table
10x with disjoint vec_id ranges (vec_id + k * 10**7). Every vector
gains 9 IDENTICAL twins — the worst case for the similarity levers:

  - embedding_near_dups: every label block grows 10x, so the blocked
    exact pair space grows 100x AND now contains ~90k true cos=1.0
    pairs (2,000 vectors x C(10,2)) instead of zero — measures how the
    blocked-exact path degrades, which is WHY it is not the 100 TB
    default;
  - srp_near_dups: identical vectors share all 8 band values, so every
    LSH bucket holds >= 10 identical signatures — candidate counts go
    quadratic per bucket while banding cost stays O(vectors x bands);
  - ann_ivf_topk: the probe-pruned scan should scale linearly with the
    corpus (scan dominates, no pair term);
  - kmeans_fit: iters x (narrow scan + k*dim exchange) — also linear.

Prints one JSON line per operator: wall seconds, result-row count, and
the candidate-pair count where the operator exposes it. Results are
recorded in SCALE.md.

Usage: python scripts/soak_similarity_sf1.py [copies]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators import similarity
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.tables import load_table

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/spark_graft_sf1"
ID_STRIDE = 10**7
THRESHOLD = 0.9
QUERY_IDS = list(range(8))


def build(spark, copies: int) -> str:
    path = os.path.join(OUT_DIR, "embeddings.parquet")
    marker = os.path.join(OUT_DIR, f".built_emb_{copies}x")
    if os.path.exists(marker):
        return path
    emb = load_table(spark, SRC_SF, "embeddings")
    out = emb.withColumn(
        "k", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    ).select(
        (F.col("vec_id") + F.col("k") * ID_STRIDE).alias("vec_id"),
        *[c for c in emb.columns if c != "vec_id"],
    )
    out.write.mode("overwrite").parquet(path)
    open(marker, "w").close()
    return path


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("soak_similarity_sf1")
    path = build(spark, copies)
    emb = spark.read.parquet(path)
    n = emb.count()
    print(json.dumps({"op": "corpus", "vectors": n, "copies": copies}))

    t0 = time.perf_counter()
    pairs = similarity.blocked_near_dup_pairs(emb, threshold=THRESHOLD)
    n_pairs = pairs.count()
    print(json.dumps({
        "op": "embedding_near_dups", "sec": round(time.perf_counter() - t0, 2),
        "pairs": n_pairs,
    }))

    def srp_candidates(n_bits: int) -> int:
        """Candidate volume behind the verify (replays the band join)."""
        sigs = similarity.srp_signatures(emb, n_bits=n_bits)
        banded = sigs.select(
            "id", F.posexplode("bands").alias("band_idx", "band_val")
        )
        return (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select("a.id", "b.id")
            .distinct()
            .count()
        )

    import math

    auto_width = max(8, math.ceil(math.log2(max(n, 1) / 64)))

    # pinned historical 8x8-bit family (what the registered query runs)
    t0 = time.perf_counter()
    n_srp = similarity.srp_near_dup_pairs(
        emb, threshold=THRESHOLD, n_bits=64
    ).count()
    srp_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_cand = srp_candidates(64)
    print(json.dumps({
        "op": "srp_near_dups_pinned64", "sec": srp_sec, "pairs": n_srp,
        "candidates": n_cand,
        "candidates_sec": round(time.perf_counter() - t0, 2),
    }))

    # AUTO-calibrated width (the round-5 default: width ~ log2(N/64))
    t0 = time.perf_counter()
    n_srp_auto = similarity.srp_near_dup_pairs(emb, threshold=THRESHOLD).count()
    srp_auto_sec = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_cand_auto = srp_candidates(8 * auto_width)
    print(json.dumps({
        "op": "srp_near_dups_auto", "sec": srp_auto_sec,
        "pairs": n_srp_auto, "band_width": auto_width,
        "candidates": n_cand_auto,
        "candidates_sec": round(time.perf_counter() - t0, 2),
    }))

    t0 = time.perf_counter()
    srp_capped = similarity.srp_near_dup_pairs(
        emb, threshold=THRESHOLD, n_bits=64, max_bucket=50
    )
    n_srp_capped = srp_capped.count()
    print(json.dumps({
        "op": "srp_near_dups_capped", "sec": round(time.perf_counter() - t0, 2),
        "pairs": n_srp_capped, "max_bucket": 50,
    }))

    t0 = time.perf_counter()
    ivf = similarity.ivf_topk(emb, QUERY_IDS, k=10, nprobe=5)
    n_ivf = ivf.count()
    print(json.dumps({
        "op": "ann_ivf_topk", "sec": round(time.perf_counter() - t0, 2),
        "rows": n_ivf,
    }))

    soak_compression(spark, emb)

    t0 = time.perf_counter()
    cents, cells = similarity.kmeans_fit(emb, k=8, iters=4)
    n_cells = cells.count()
    print(json.dumps({
        "op": "kmeans_fit", "sec": round(time.perf_counter() - t0, 2),
        "assigned": n_cells,
    }))

    # SemDeDup closure scaling: the pair stage is quadratic WITHIN a
    # block, so the scale lever is growing k with N (bounded cells).
    # Fixed k=8 lets cells grow ~10x (pair work ~100x); k=80 holds
    # cell size at the sf0.1 level — wall should stay near-linear.
    from map_reduce_rpc_spark.operators.graph import components_within_blocks

    for k in (8, 80):
        t0 = time.perf_counter()
        cents_k, _ = similarity.kmeans_fit(emb, k=k, iters=2)
        celled = similarity.assign_cells(emb, cents_k)
        pairs = similarity.blocked_near_dup_pairs(
            celled, threshold=0.35, block_col="cell", keep_block_col=True
        )
        comp = components_within_blocks(pairs, block_col="blk")
        n_comp = comp.count()
        print(json.dumps({
            "op": f"semantic_dedup_cells_k{k}",
            "sec": round(time.perf_counter() - t0, 2),
            "clustered_nodes": n_comp,
        }))
    spark.stop()




def soak_compression(spark, emb) -> None:
    """Round-5 compression tiers at 10x: SQ8 (calibrate + encode +
    int-dot top-k) and PQ (codebooks + encode + ADC / + re-rank) are
    scan-shaped — one narrow pass over codes plus a broadcast query
    set — so wall should track the corpus linearly, never a pair
    term."""
    t0 = time.perf_counter()
    n_sq8 = similarity.sq8_topk(emb, QUERY_IDS, k=10).count()
    print(json.dumps({
        "op": "ann_sq8_topk", "sec": round(time.perf_counter() - t0, 2),
        "rows": n_sq8,
    }))
    t0 = time.perf_counter()
    n_adc = similarity.pq_adc_topk(emb, QUERY_IDS, k=10).count()
    print(json.dumps({
        "op": "ann_pq_adc_topk", "sec": round(time.perf_counter() - t0, 2),
        "rows": n_adc,
    }))
    t0 = time.perf_counter()
    n_rr = similarity.pq_rerank_topk(emb, QUERY_IDS, k=10, shortlist=50).count()
    print(json.dumps({
        "op": "ann_pq_rerank_topk", "sec": round(time.perf_counter() - t0, 2),
        "rows": n_rr,
    }))

if __name__ == "__main__":
    main()
