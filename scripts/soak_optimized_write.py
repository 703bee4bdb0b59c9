"""Soak: optimized write (round-14) — does at-write bin-packing hold
ingest file counts at post-OPTIMIZE parity?

A high-frequency ingest table takes many small appends from
many-partition frames; without optimized write every append stages
one file PER TASK (x per hive dir), and the table leans on OPTIMIZE
cadence to repair the spray. `append(optimized_write=True)` adds one
shuffle sized by Catalyst's plan estimate so each append stages
~target-size files instead.

Run: python scripts/soak_optimized_write.py
Prints one JSON line: files after N appends in each mode, the
post-OPTIMIZE count, and wall times.
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from map_reduce_rpc_spark.sources import txlog  # noqa: E402

N_APPENDS = 20
ROWS_PER_APPEND = 50_000
TASKS = 16  # upstream layout: every append arrives 16-way partitioned
TARGET = 8 << 20  # 8 MiB target => each small append packs to 1 file


def batch(spark, i: int):
    return (
        spark.range(i * ROWS_PER_APPEND, (i + 1) * ROWS_PER_APPEND)
        .select(
            "id",
            (F.col("id") % 7).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(TASKS)
    )


def ingest(spark, root: str, optimized: bool) -> dict:
    txlog.create_table(spark, root, batch(spark, 99).limit(0))
    t0 = time.time()
    for i in range(N_APPENDS):
        txlog.append(
            spark,
            root,
            batch(spark, i),
            optimized_write=optimized,
            target_file_bytes=TARGET,
        )
    wall = time.time() - t0
    v = txlog.current_version(root)
    files = len(txlog.snapshot_info(root, v)["files"])
    return {"files": files, "wall_sec": round(wall, 2)}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = f"/tmp/soak_optwrite_{os.getpid()}"
    shutil.rmtree(base, ignore_errors=True)

    plain = ingest(spark, os.path.join(base, "plain"), optimized=False)
    opt = ingest(spark, os.path.join(base, "opt"), optimized=True)

    # the repair the optimized path should make unnecessary
    t0 = time.time()
    txlog.optimize(
        spark, os.path.join(base, "plain"), target_file_bytes=TARGET
    )
    repaired = len(
        txlog.snapshot_info(
            os.path.join(base, "plain"),
            txlog.current_version(os.path.join(base, "plain")),
        )["files"]
    )
    # The floor for at-write packing is ONE file per append: each
    # append is one atomic commit, and a commit cannot merge into a
    # previous commit's files. OPTIMIZE can pack ACROSS commits, so
    # its count can go below n_appends — parity means the optimized
    # ingest reaches the at-write floor (within the +1 empty-create
    # file), i.e. the repair job has nothing per-commit left to fix.
    floor = max(N_APPENDS, repaired)
    out = {
        "n_appends": N_APPENDS,
        "rows_per_append": ROWS_PER_APPEND,
        "upstream_tasks": TASKS,
        "plain": plain,
        "optimized": opt,
        "plain_post_optimize_files": repaired,
        "optimize_wall_sec": round(time.time() - t0, 2),
        "files_per_append_plain": round(plain["files"] / N_APPENDS, 2),
        "files_per_append_optimized": round(opt["files"] / N_APPENDS, 2),
        "ingest_parity": opt["files"] <= floor + 1,
    }
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
