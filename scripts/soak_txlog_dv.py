#!/usr/bin/env python
"""Deletion-vector soak (round-12): measure merge-on-read vs
copy-on-write for the point-delete workload on a REAL multi-file
table, certifying the design claim the docstrings make — "removing
KBs no longer rewrites GBs".

Setup: a txlog table of N_ROWS rows across N_FILES files with the
victim keys SCATTERED so every file contains at least one (the cow
worst case and the realistic GDPR shape: one user's rows land
everywhere). Then delete K scattered rows both ways on identical
clones and measure:

- bytes the commit durably wrote (cow: every file re-staged; dv: one
  sidecar + one delta manifest),
- wall time of the delete verb,
- read-back wall time + exactness after each (the dv anti-join's
  read-side cost is the price of skipping the rewrite),
- optimize-materialization wall (the dv debt retired on compaction
  cadence).

Prints one JSON line; numbers recorded in SCALE.md's txlog section.

Usage: python scripts/soak_txlog_dv.py [n_rows] [n_files] [k_victims]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/tmp/spark_graft_txlog_dv_soak"


def _tree_bytes(root: str) -> int:
    total = 0
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            try:
                total += os.path.getsize(os.path.join(dirpath, n))
            except OSError:
                pass
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from map_reduce_rpc_spark.session import get_spark
    from map_reduce_rpc_spark.sources import txlog

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    spark = get_spark("txlog_dv_soak")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BASE, ignore_errors=True)
    src = os.path.join(BASE, "src")
    df = (
        spark.range(0, n_rows)
        .select(
            "id",
            (F.col("id") % 97).alias("bucket"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(n_files)  # round-robin: victims scatter everywhere
    )
    txlog.create_table(spark, src, df)
    stride = n_rows // k
    pred = f"id % {stride} = 0"  # K victims, >=1 per file w.h.p.

    out = {"n_rows": n_rows, "n_files": n_files, "k_victims": k}
    for mode in ("cow", "dv"):
        root = os.path.join(BASE, mode)
        txlog.clone_table(spark, src, root)
        before = _tree_bytes(root)
        t0 = time.time()
        txlog.delete_where(spark, root, pred, mode=mode)
        dt = time.time() - t0
        m = txlog._read_manifest(root, 1)
        written = _tree_bytes(root) - before
        t0 = time.time()
        n_live = txlog.read_table(spark, root).count()
        read_s = time.time() - t0
        out[mode] = {
            "delete_wall_s": round(dt, 2),
            "bytes_written": written,
            "files_rewritten": int(m.get("rewrote", 0)),
            "rows_after": n_live,
            "read_wall_s": round(read_s, 2),
        }
        assert n_live == n_rows - (n_rows + stride - 1) // stride

    # the dv table's debt retirement: one optimize materializes
    t0 = time.time()
    txlog.optimize(spark, os.path.join(BASE, "dv"))
    out["dv_optimize_wall_s"] = round(time.time() - t0, 2)
    assert (
        txlog.snapshot_info(
            os.path.join(BASE, "dv"),
            txlog.current_version(os.path.join(BASE, "dv")),
        )["dv"]
        == {}
    )
    out["bytes_ratio_cow_over_dv"] = round(
        out["cow"]["bytes_written"] / max(1, out["dv"]["bytes_written"]), 1
    )

    # ---- read-back cost vs VECTOR COVERAGE (round-12 verdict item 8):
    # the worst case above vectors EVERY file; real tables sit between
    # OPTIMIZE runs with a small vectored fraction. Measure the read
    # wall at ~1% / 10% / 50% of files carrying vectors, on a
    # range-laid-out clone so victims confine to a file fraction, and
    # report the clean baseline alongside — the curve that justifies
    # "the dv debt retires on compaction cadence".
    cad_src = os.path.join(BASE, "cad_src")
    txlog.create_table(
        spark,
        cad_src,
        spark.range(0, n_rows)
        .select(
            "id",
            (F.col("id") % 97).alias("bucket"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartitionByRange(n_files, "id"),  # contiguous id per file
    )
    t0 = time.time()
    assert txlog.read_table(spark, cad_src).count() == n_rows
    cadence: dict = {"clean_read_s": round(time.time() - t0, 2)}
    for frac in (0.01, 0.10, 0.50):
        root = os.path.join(BASE, f"cad_{int(frac * 100)}")
        txlog.clone_table(spark, cad_src, root)
        hi = int(n_rows * frac)
        stride_f = max(1, hi // k)
        txlog.delete_where(
            spark, root, f"id < {hi} AND id % {stride_f} = 0", mode="dv"
        )
        snap = txlog.snapshot_info(root, txlog.current_version(root))
        t0 = time.time()
        n_live = txlog.read_table(spark, root).count()
        read_s = time.time() - t0
        assert n_live == n_rows - len(
            range(0, hi, stride_f)
        ), (n_live, hi, stride_f)
        cadence[f"vectored_{int(frac * 100)}pct"] = {
            "files_vectored": len(snap["dv"]),
            "files_total": len(snap["files"]),
            "read_wall_s": round(read_s, 2),
        }
    out["dv_read_cadence"] = cadence
    print(json.dumps(out))
    shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
