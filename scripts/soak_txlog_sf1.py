#!/usr/bin/env python
"""sf1 soak of the transactional table (sources/txlog.py): a
realistic commit chain — create, a run of appends, a run of merges,
an optimize, a full change-feed read — timed per commit against the
10x orders replica (/tmp/spark_graft_sf1, ~1.5M rows).

What the numbers must show (the 100 TB contracts):

- **append cost is O(batch)**, flat across the chain — staging new
  files + one manifest link; the growing table never re-reads.
- **merge cost = probe + victim rewrite**: the probe scans ONE
  column (the key) of the current snapshot (column-pruned parquet
  scan — the same find-touched-files join Delta MERGE runs), the
  rewrite is bounded by the files that actually contain matched
  keys. Flat-ish across the chain while the table grows.
- **optimize is one bounded rewrite** whose cost tracks total bytes,
  paid once; the change feed across it is empty.
- **read_changes replays the whole chain in O(touched files)** —
  appends diff nothing, the optimize commit cancels.

Prints one JSON line; numbers recorded in SCALE.md's txlog section.

Usage: python scripts/soak_txlog_sf1.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/spark_graft_sf1")
ROOT = "/tmp/spark_graft_txlog_soak"
N_APPENDS = 6
N_MERGES = 3


def main() -> None:
    from pyspark.sql import functions as F

    from map_reduce_rpc_spark.session import get_spark
    from map_reduce_rpc_spark.sources import txlog
    from map_reduce_rpc_spark.tables import load_table

    spark = get_spark("txlog_soak", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = load_table(spark, SF1, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_total = base.count()
    shutil.rmtree(ROOT, ignore_errors=True)

    out: dict[str, object] = {"sf_dir": SF1, "orders_rows": n_total}

    # create from slice 0 of N_APPENDS+1 equal hash slices
    slices = N_APPENDS + 1

    def part(i):
        return base.where(F.col("o_orderkey") % slices == i)

    t0 = time.perf_counter()
    txlog.create_table(spark, ROOT, part(0).repartition(8))
    out["create_sec"] = round(time.perf_counter() - t0, 3)

    appends = []
    for i in range(1, N_APPENDS + 1):
        t0 = time.perf_counter()
        txlog.append(spark, ROOT, part(i))
        appends.append(round(time.perf_counter() - t0, 3))
    out["append_sec"] = appends

    merges = []
    for j in range(N_MERGES):
        upd = base.where(F.col("o_orderkey") % 199 == j).select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_totalprice") + 1).alias("o_totalprice"),
        )
        t0 = time.perf_counter()
        txlog.merge(spark, ROOT, upd, ("o_orderkey",))
        merges.append(round(time.perf_counter() - t0, 3))
    out["merge_sec"] = merges

    # round-14 verb: UPDATE in both modes against the grown table —
    # cow cost = matched rows' file spread (scattered predicate, so
    # the honest ceiling: most files contain a match), dv cost =
    # O(matched rows) metadata + one small append, files untouched
    t0 = time.perf_counter()
    txlog.update_where(
        spark,
        ROOT,
        {"o_totalprice": "o_totalprice + 1"},
        "o_custkey % 211 = 5",
    )
    out["update_cow_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    txlog.update_where(
        spark,
        ROOT,
        {"o_totalprice": "o_totalprice + 1"},
        "o_custkey % 211 = 6",
        mode="dv",
    )
    out["update_dv_sec"] = round(time.perf_counter() - t0, 3)
    m_dv = txlog._read_manifest(ROOT, txlog.current_version(ROOT))
    assert m_dv["op"] == "update" and m_dv["rewrote"] == 0
    out["update_dv_rows"] = int(m_dv["dv_rows"])

    v_before_opt = txlog.current_version(ROOT)
    t0 = time.perf_counter()
    txlog.optimize(spark, ROOT, cluster_by=("o_orderkey",))
    out["optimize_sec"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    cdf = txlog.read_changes(spark, ROOT, from_version=-1)
    by_type = {
        r["_change_type"]: r["n"]
        for r in cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    out["cdf_sec"] = round(time.perf_counter() - t0, 3)
    out["cdf_rows"] = by_type

    # invariants: final row count == corpus (merges replace, never add
    # — the % 199 keys all exist); optimize contributed zero changes
    n_final = txlog.read_table(spark, ROOT).count()
    assert n_final == n_total, (n_final, n_total)
    opt_changes = txlog.read_changes(spark, ROOT, v_before_opt).count()
    assert opt_changes == 0, opt_changes
    out["final_rows"] = n_final
    out["versions"] = txlog.current_version(ROOT)

    # ---- phase B: the manifest-stats pruning lever, measured ----
    # The phase-A merges use modulo keys (every batch spans the whole
    # key range -> every file is a candidate, pruning CANNOT help —
    # the honest ceiling). Real CDC batches are usually key-LOCAL
    # (monotonic ids: recent orders); on a key-clustered table the
    # manifest stats then collapse the probe. Measure exactly that:
    # same table content, key-clustered layout, a contiguous 1%-range
    # batch — probed files and wall time vs a full-range batch of the
    # same SIZE.
    root_b = ROOT + "_clustered"
    shutil.rmtree(root_b, ignore_errors=True)
    txlog.create_table(
        spark,
        root_b,
        base.repartitionByRange(24, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
    )
    import json as _json

    n_files_b = len(txlog.snapshot_info(root_b, 0)["files"])
    lo, hi = 1, n_total // 100  # contiguous 1% of the key range
    local = base.where(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") <= hi)
    ).select(
        "o_orderkey", "o_custkey", (F.col("o_totalprice") + 1).alias("o_totalprice")
    )
    t0 = time.perf_counter()
    v_local = txlog.merge(spark, root_b, local, ("o_orderkey",))
    out["merge_local_sec"] = round(time.perf_counter() - t0, 3)
    m_local = _json.load(open(txlog._manifest_path(root_b, v_local)))
    out["merge_local_probed"] = [m_local["probed"], n_files_b]

    spread = base.where(F.col("o_orderkey") % 99 == 1).select(
        "o_orderkey", "o_custkey", (F.col("o_totalprice") + 2).alias("o_totalprice")
    )
    t0 = time.perf_counter()
    v_spread = txlog.merge(spark, root_b, spread, ("o_orderkey",))
    out["merge_spread_sec"] = round(time.perf_counter() - t0, 3)
    m_spread = _json.load(open(txlog._manifest_path(root_b, v_spread)))
    out["merge_spread_probed"] = [
        m_spread["probed"],
        len(txlog.snapshot_info(root_b, v_local)["files"]),
    ]
    assert m_local["probed"] < n_files_b, "local batch was not pruned"

    # ---- phase C (round 11): hive partition columns at sf1 ----
    # One partition of a 1.5M-row 5-way-partitioned table costs ~1/5
    # of the full read at PLANNING time (file lists pruned from
    # manifest paths before any IO), and a partition-filtered change
    # feed pays only its partition's touched files.
    root_c = ROOT + "_part"
    shutil.rmtree(root_c, ignore_errors=True)
    from map_reduce_rpc_spark.tables import load_table as _lt

    part_base = _lt(spark, SF1, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    t0 = time.perf_counter()
    txlog.create_table(
        spark, root_c, part_base, partition_by=("o_orderpriority",)
    )
    out["part_create_sec"] = round(time.perf_counter() - t0, 3)
    txlog.append(spark, root_c, part_base.limit(50_000))  # churn commit
    t0 = time.perf_counter()
    n_full = txlog.read_table(spark, root_c).count()
    out["part_full_read_sec"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    one = txlog.read_table(
        spark, root_c, partitions={"o_orderpriority": "1-URGENT"}
    )
    n_one = one.count()
    out["part_pruned_read_sec"] = round(time.perf_counter() - t0, 3)
    out["part_rows"] = [n_one, n_full]
    out["part_files"] = [
        len(one.inputFiles()),
        len(txlog.read_table(spark, root_c).inputFiles()),
    ]
    t0 = time.perf_counter()
    n_feed = txlog.read_changes(
        spark, root_c, -1, partitions={"o_orderpriority": "1-URGENT"}
    ).count()
    out["part_cdf_sec"] = round(time.perf_counter() - t0, 3)
    out["part_cdf_rows"] = n_feed
    assert out["part_files"][0] < out["part_files"][1]

    shutil.rmtree(root_c, ignore_errors=True)
    shutil.rmtree(root_b, ignore_errors=True)
    shutil.rmtree(ROOT, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
