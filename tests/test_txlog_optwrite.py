"""Optimized write (round-14, Delta's optimizeWrite): at-write
small-file prevention. Library path: ``append(optimized_write=True)``
adds one shuffle sized by the Catalyst plan estimate so a small
append stages ONE ~target file regardless of the upstream task
layout. DataSource path: ``.option("target_file_bytes", N)`` rolls a
file once its Arrow bytes pass the target (the oversize cap; tasks
cannot coalesce across each other). Reference: N/A — the Go engine
has no storage format (SURVEY §2.4); the soak twin is
scripts/soak_optimized_write.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog, txlog_source


def _files(root):
    return txlog.snapshot_info(root, txlog.current_version(root))["files"]


def _frame(spark, n=5000, parts=8):
    return (
        spark.range(0, n)
        .select(
            "id",
            (F.col("id") % 3).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        .repartition(parts)
    )


def test_optimized_append_packs_small_batch_to_one_file(spark, tmp_path):
    root = str(tmp_path / "opt")
    txlog.create_table(spark, root, _frame(spark).limit(0))
    n_base = len(_files(root))  # the empty create may stage a file
    # plain append: one file per upstream task
    txlog.append(spark, root, _frame(spark))
    n_plain = len(_files(root))
    assert n_plain == n_base + 8
    # optimized append of the SAME frame: the estimate (~KBs) is far
    # under the target, so the shuffle collapses it to ONE file
    txlog.append(
        spark, root, _frame(spark), optimized_write=True,
        target_file_bytes=128 << 20,
    )
    assert len(_files(root)) == n_plain + 1
    # and the rows all arrived (the shuffle changed layout, not data)
    assert txlog.read_table(spark, root).count() == 10_000


def test_optimized_append_partitioned_collapses_per_dir(spark, tmp_path):
    """Partitioned table: hashing on the partition columns puts whole
    hive dirs on one task — per-dir file count collapses from
    tasks x dirs to ~1 x dirs."""
    import os

    root = str(tmp_path / "optp")
    txlog.create_table(
        spark, root, _frame(spark).limit(0), partition_by=("k",)
    )
    txlog.append(spark, root, _frame(spark))
    plain = len(_files(root))
    assert plain > 3  # several tasks hit each of the 3 dirs
    root2 = str(tmp_path / "optp2")
    txlog.create_table(
        spark, root2, _frame(spark).limit(0), partition_by=("k",)
    )
    txlog.append(
        spark, root2, _frame(spark), optimized_write=True,
        target_file_bytes=128 << 20,
    )
    got = [r for r in _files(root2) if "=" in r]  # data dirs only
    assert len(got) == 3  # one file per k-value directory
    dirs = {os.path.dirname(r) for r in got}
    assert len(dirs) == 3
    assert (
        txlog.read_table(spark, root2).orderBy("id").collect()
        == txlog.read_table(spark, root).orderBy("id").collect()
    )


def test_target_file_bytes_rolls_oversize_sql_writes(spark, tmp_path):
    """DataSource path: a tiny target forces mid-task rolls — many
    at-or-under-target files instead of one monster per task."""
    import os

    root = str(tmp_path / "roll")
    txlog.create_table(spark, root, _frame(spark).limit(0))
    txlog_source.register(spark)
    (
        _frame(spark, n=20_000, parts=1)
        .write.format("txlog")
        .option("path", root)
        .option("target_file_bytes", str(64 << 10))  # 64 KiB
        .mode("append")
        .save()
    )
    files = _files(root)
    assert len(files) > 3  # one task, several rolled files
    # parquet compresses below the Arrow-bytes target; allow slack
    # for one batch overshooting the threshold before the roll
    assert all(
        os.path.getsize(os.path.join(root, rel)) < (64 << 10) * 4
        for rel in files
    )
    assert txlog.read_table(spark, root).count() == 20_000
    # invalid target is a loud error at sink construction
    with pytest.raises(Exception, match="positive"):
        (
            _frame(spark)
            .write.format("txlog")
            .option("path", root)
            .option("target_file_bytes", "0")
            .mode("append")
            .save()
        )
