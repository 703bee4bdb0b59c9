#!/usr/bin/env python
"""Manifest-scaling soak (round-10 verdict item 2): measure the
transactional table's commit and resolution costs on a table with
10^4+ data files, certifying that the delta-action log + checkpoint
design actually removed the O(files)-JSON-per-commit wall.

What the numbers must show (the 10^6-file / 100 TB contracts):

- **delta commit bytes are O(touched files)** — appending a 1-file
  batch to a 10^4-file table writes a manifest ~1000x smaller than
  the full file list (the round-10 design wrote the FULL list every
  commit: ~10^4 entries + stats per append).
- **commit latency is flat in table size** — staging + stats for the
  new files + one hard link; no O(files) JSON serialization.
- **snapshot resolution replays <= checkpoint_every manifests** —
  time to resolve the current version's file list stays milliseconds.
- **checkpoints amortize**: a checkpoint commit's full manifest is
  the only O(files) write, paid every checkpoint_every commits.

The 10^4 files are built by hard-linking one real parquet file under
unique names and hand-publishing a full v0 manifest — the soak
measures LOG costs, not Spark write throughput (10^4 real writes
would measure the local disk, not the design).

Prints one JSON line; numbers recorded in SCALE.md's txlog section.

Usage: python scripts/soak_txlog_manifest.py [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/tmp/spark_graft_txlog_manifest_soak"
N_FILES = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_COMMITS = 25  # crosses at least one checkpoint at the default cadence


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from map_reduce_rpc_spark.sources import txlog

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(ROOT, ignore_errors=True)
    table = os.path.join(ROOT, "tx")

    # v0: one real 1000-row file, hard-linked N times under unique
    # names, published as a hand-built full manifest (bypasses Spark
    # write throughput; the log layer sees N real parquet files)
    seed_dir = os.path.join(ROOT, "seed")
    spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    ).coalesce(1).write.parquet(seed_dir)
    seed = next(
        os.path.join(seed_dir, n)
        for n in os.listdir(seed_dir)
        if n.endswith(".parquet")
    )
    # ext4 caps hard links per inode (~65k): rotate one seed copy per
    # 50k links
    seeds = [seed]
    for j in range(1, (N_FILES - 1) // 50_000 + 1):
        cp = f"{seed}.copy{j}"
        shutil.copyfile(seed, cp)
        seeds.append(cp)
    os.makedirs(os.path.join(table, "data"))
    rels = []
    t0 = time.time()
    for i in range(N_FILES):
        rel = f"data/part-seed-{i:06d}.parquet"
        os.link(seeds[i // 50_000], os.path.join(table, rel))
        rels.append(rel)
    t_link = time.time() - t0
    stats = txlog._collect_stats(table, rels[:1])  # one footer, shared
    m0 = {
        "version": 0,
        "op": "create",
        "parent": None,
        "schema": spark.read.parquet(
            os.path.join(table, rels[0])
        ).schema.json(),
        "txn": {},
        "n_files": len(rels),
        "ts": time.time(),
        "checkpoint_every": txlog.DEFAULT_CHECKPOINT_EVERY,
    }
    all_stats = {r: stats[rels[0]] for r in rels}
    if N_FILES >= txlog.SIDECAR_MIN_FILES:
        m0["files_ref"] = txlog._write_sidecar(table, rels, all_stats)
    else:
        m0["files"] = rels
        m0["stats"] = all_stats
    ok = txlog._try_commit(table, 0, m0)
    assert ok
    full_bytes = os.path.getsize(txlog._manifest_path(table, 0))
    if "files_ref" in m0:
        full_bytes = os.path.getsize(
            os.path.join(table, "_txlog", m0["files_ref"])
        )

    # resolution cost at v0 (one full manifest read)
    t0 = time.time()
    snap = txlog.snapshot_info(table, 0)
    t_resolve0 = time.time() - t0
    assert len(snap["files"]) == N_FILES

    # N_COMMITS single-file appends: latency + manifest bytes each
    batch = spark.range(10**9, 10**9 + 10).select(
        F.col("id"), F.lit(99).alias("bucket")
    ).coalesce(1)
    commit_secs, delta_bytes, ckpt_bytes = [], [], []
    sidecar_bytes = []
    for _ in range(N_COMMITS):
        t0 = time.time()
        v = txlog.append(spark, table, batch)
        commit_secs.append(time.time() - t0)
        b = os.path.getsize(txlog._manifest_path(table, v))
        m = txlog._read_manifest(table, v)
        if "files_ref" in m:
            ckpt_bytes.append(b)
            sidecar_bytes.append(
                os.path.getsize(
                    os.path.join(table, "_txlog", m["files_ref"])
                )
            )
        elif "files" in m:
            ckpt_bytes.append(b)
        else:
            delta_bytes.append(b)

    # resolution cost at the head (checkpoint + up to cadence deltas)
    t0 = time.time()
    head = txlog.snapshot_info(table, txlog.current_version(table))
    t_resolve_head = time.time() - t0
    assert len(head["files"]) == N_FILES + N_COMMITS

    # correctness spot-check: a pruned scan plans O(1) files
    t0 = time.time()
    n_rows = txlog.scan_table(spark, table, "id", 10**9, 10**9 + 4).count()
    t_scan = time.time() - t0
    assert n_rows == 5 * N_COMMITS

    out = {
        "n_files": N_FILES,
        "n_commits": N_COMMITS,
        "link_secs": round(t_link, 3),
        "full_manifest_bytes": full_bytes,
        "delta_manifest_bytes_max": max(delta_bytes),
        "bytes_ratio_full_over_delta": round(
            full_bytes / max(delta_bytes), 1
        ),
        "checkpoint_manifest_bytes": max(ckpt_bytes) if ckpt_bytes else None,
        "checkpoint_sidecar_bytes": (
            max(sidecar_bytes) if sidecar_bytes else None
        ),
        "n_checkpoints": len(ckpt_bytes),
        "append_secs_min": round(min(commit_secs), 3),
        "append_secs_max": round(max(commit_secs), 3),
        "resolve_v0_secs": round(t_resolve0, 4),
        "resolve_head_secs": round(t_resolve_head, 4),
        "stats_pruned_scan_secs": round(t_scan, 3),
    }
    print(json.dumps(out))
    shutil.rmtree(ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
