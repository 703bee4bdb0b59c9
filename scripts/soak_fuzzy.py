#!/usr/bin/env python
"""Fuzzy-matching blocking soak (round 5): quantify the Ed-Join
q-gram prefix filter against plain length-band blocking on a
synthetic name corpus sized far past the real part catalog.

The corpus is UNIFORM-LENGTH (3 x 6-letter md5-derived words), which
is the length band's worst case — zero length selectivity, so the
band-only candidate set is the full C(n,2) pair space. The q-gram
prefix filter is the lever that still prunes there. Both paths must
return identical pairs (the lossless contract, also pytest-proven).

Prints one JSON line per measurement; results recorded in SCALE.md.

Usage: python scripts/soak_fuzzy.py [n_names]   (default 8000)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from map_reduce_rpc_spark.operators import dedup
from map_reduce_rpc_spark.session import get_spark


def _word(i: int) -> str:
    h = hashlib.md5(f"w{i}".encode()).hexdigest()
    return "".join(chr(ord("a") + int(c, 16) % 26) for c in h[:6])


def main() -> None:
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    spark = get_spark("soak_fuzzy")
    names = list(
        dict.fromkeys(
            f"{_word(i % 503)} {_word((i // 503) % 499)} {_word((i * 31 + 7) % 509)}"
            for i in range(n_target)
        )
    )
    df = spark.createDataFrame([(n,) for n in names], "name string")
    print(json.dumps({"op": "corpus", "distinct_names": len(names)}))

    # band-only candidate volume (the pair space the verify would scan)
    band = 3
    nm = df.distinct()
    a = nm.select(
        F.col("name").alias("name_a"),
        F.explode(
            F.sequence(
                F.greatest(F.length("name") - band, F.lit(0)),
                F.length("name") + band,
            )
        ).alias("lb"),
    )
    b = nm.select(F.col("name").alias("name_b"), F.length("name").alias("lb"))
    t0 = time.perf_counter()
    n_band = a.join(b, ["lb"]).where(F.col("name_a") < F.col("name_b")).count()
    print(json.dumps({
        "op": "band_candidates", "pairs": n_band,
        "sec": round(time.perf_counter() - t0, 2),
    }))

    t0 = time.perf_counter()
    r_plain = dedup.fuzzy_name_pairs(df, "name", max_dist=3, qgram=None).count()
    print(json.dumps({
        "op": "fuzzy_plain", "sec": round(time.perf_counter() - t0, 2),
        "pairs": r_plain,
    }))
    t0 = time.perf_counter()
    r_qgram = dedup.fuzzy_name_pairs(df, "name", max_dist=3, qgram=2).count()
    print(json.dumps({
        "op": "fuzzy_qgram", "sec": round(time.perf_counter() - t0, 2),
        "pairs": r_qgram,
    }))
    assert r_plain == r_qgram, "lossless contract violated"
    spark.stop()


if __name__ == "__main__":
    main()
