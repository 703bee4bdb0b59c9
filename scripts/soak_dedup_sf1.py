#!/usr/bin/env python
"""sf1-scale soak of the dedup trio (VERDICT r2 item #8).

/root/testdata tops out at sf0.1, so this materializes an sf1-sized
documents table in /tmp by replicating sf0.1 10x with disjoint doc_id
ranges (doc_id + k * 10**7). Exact replication is deliberate: every
document gains 9 identical twins, which is the WORST case for the
candidate-pair levers this soak exists to validate —

  - ngram_jaccard:   every shingle's df multiplies by 10, so the
                     max_df=100 prune must absorb a 10x hotter tail;
  - minhash LSH:     every band bucket holds >= 10 identical sigs, so
                     candidate counts grow quadratically in copies;
  - simhash:         identical docs share all 4 bands; the
                     max_bucket=50 cap must bound degenerate buckets.

Prints one JSON line per operator: wall seconds, result-pair count,
and the intermediate candidate-pair count where the operator exposes
it. Results are recorded in SCALE.md.

Usage: python scripts/soak_dedup_sf1.py [copies]   (default 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators import dedup
from map_reduce_rpc_spark.plans import textops
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.tables import load_table, spread_partitions

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/spark_graft_sf1"
ID_STRIDE = 10**7


def build(spark, copies: int) -> str:
    path = os.path.join(OUT_DIR, "documents.parquet")
    marker = os.path.join(OUT_DIR, f".built_{copies}x")
    if os.path.exists(marker):
        return OUT_DIR
    docs = load_table(spark, SRC_SF, "documents")
    out = docs.withColumn(
        "k", F.explode(F.sequence(F.lit(0), F.lit(copies - 1)))
    ).select(
        (F.col("doc_id") + F.col("k") * ID_STRIDE).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    out.write.mode("overwrite").parquet(path)
    open(marker, "w").close()
    return OUT_DIR


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("soak_sf1")
    sf_dir = build(spark, copies)
    docs = spread_partitions(load_table(spark, sf_dir, "documents"))
    n_docs = docs.count()
    print(json.dumps({"op": "corpus", "docs": n_docs, "copies": copies}))

    t0 = time.perf_counter()
    jac = dedup.ngram_jaccard_pairs(
        docs, "doc_id", "text",
        n=textops.NGRAM_N,
        threshold=textops.JACCARD_THRESHOLD,
        max_df=textops.MAX_SHINGLE_DF,
    )
    n_jac = jac.count()
    print(json.dumps({
        "op": "ngram_jaccard", "sec": round(time.perf_counter() - t0, 2),
        "pairs": n_jac, "max_df": textops.MAX_SHINGLE_DF,
    }))

    t0 = time.perf_counter()
    mh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text",
        n=textops.NGRAM_N,
        num_perm=textops.MINHASH_PERMS,
        bands=textops.MINHASH_BANDS,
        threshold=textops.JACCARD_THRESHOLD,
    )
    n_mh = mh.count()
    print(json.dumps({
        "op": "minhash_lsh", "sec": round(time.perf_counter() - t0, 2),
        "pairs": n_mh,
    }))

    t0 = time.perf_counter()
    sh = dedup.simhash_pairs(
        docs, "doc_id", "text",
        max_hamming=3, max_bucket=textops.SIMHASH_MAX_BUCKET,
    )
    n_sh = sh.count()
    print(json.dumps({
        "op": "simhash", "sec": round(time.perf_counter() - t0, 2),
        "pairs": n_sh, "max_bucket": textops.SIMHASH_MAX_BUCKET,
    }))

    t0 = time.perf_counter()
    cont = dedup.containment_pairs(
        docs, "doc_id", "text",
        k=textops.CONTAIN_K,
        min_shared=textops.CONTAIN_MIN_SHARED,
        max_df=textops.CONTAIN_MAX_DF,
    )
    n_cont = cont.count()
    print(json.dumps({
        "op": "containment", "sec": round(time.perf_counter() - t0, 2),
        "pairs": n_cont, "max_df": textops.CONTAIN_MAX_DF,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
