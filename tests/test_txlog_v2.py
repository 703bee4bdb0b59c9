"""Round-11 transactional-table surface: delta-action manifests +
checkpoints (commit bytes O(touched files), resolution O(cadence)),
hive partition columns with manifest-level pruning, type widening in
schema evolution, concurrent-evolution merge on retry, commit-point
hardening (post-link errors, vacuum-raced temp manifests), NULL merge
keys, and the vacuum retention contract."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog


def _manifest(root: str, v: int) -> dict:
    return json.load(open(txlog._manifest_path(root, v)))


# ---------------------------------------------------------------- #
# delta-action log + checkpoints
# ---------------------------------------------------------------- #

def test_delta_manifests_and_checkpoints(spark, tmp_path):
    """Ordinary commits log only add/remove actions; every
    checkpoint_every versions a full manifest snapshots the file
    list, so any version resolves by replaying at most one interval;
    reads, time travel, and the change feed are exact across both
    manifest kinds."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 100).select(F.col("id")),
        checkpoint_every=4,
    )
    for i in range(9):
        txlog.append(
            spark,
            root,
            spark.range(100 + i * 10, 110 + i * 10).select(F.col("id")),
        )
    # v0 create: full; v1-v3 deltas; v4 checkpoint full; v5-v7 deltas;
    # v8 checkpoint full; v9 delta
    assert "files" in _manifest(root, 0)
    for v in (1, 2, 3, 5, 6, 7, 9):
        m = _manifest(root, v)
        assert "files" not in m and "stats" not in m, v
        assert m["add"] and m["remove"] == [], v
    for v in (4, 8):
        m = _manifest(root, v)
        assert m.get("checkpoint") is True
        assert set(m["files"]) == set(txlog.snapshot_info(root, v)["files"])
        assert "schema" in m  # checkpoints re-record the binding
    # every version resolves and reads exactly its rows
    for v, expect in ((0, 100), (2, 120), (4, 140), (7, 170), (9, 190)):
        assert txlog.read_table(spark, root, version=v).count() == expect
    # the change feed crosses checkpoint boundaries losslessly
    cdf = txlog.read_changes(spark, root, from_version=0)
    assert cdf.count() == 90
    assert cdf.where("_change_type != 'insert'").count() == 0
    assert (
        cdf.groupBy("_commit_version").count().where("count != 10").count()
        == 0
    )


def test_delta_manifest_bytes_independent_of_table_size(spark, tmp_path):
    """THE scaling property the round-10 verdict asked for: on a
    many-file table, an ordinary commit's manifest bytes are
    O(touched files), not O(table files) — the full-file-list wall at
    10^5+ files is gone (full manifests recur only at the checkpoint
    cadence, amortizing to O(files/cadence) per commit, the Delta
    log+checkpoint trade)."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 2000).select(F.col("id")).repartition(400),
        checkpoint_every=10,
    )
    assert len(txlog.snapshot_info(root, 0)["files"]) == 400
    txlog.append(spark, root, spark.range(5000, 5010).select(F.col("id")))
    full_bytes = os.path.getsize(txlog._manifest_path(root, 0))
    delta_bytes = os.path.getsize(txlog._manifest_path(root, 1))
    assert delta_bytes < full_bytes / 20, (delta_bytes, full_bytes)
    # resolution composes checkpoint + deltas exactly
    assert txlog.read_table(spark, root).count() == 2010
    assert len(txlog.snapshot_info(root, 1)["files"]) >= 401


# ---------------------------------------------------------------- #
# hive partition columns
# ---------------------------------------------------------------- #

@pytest.fixture()
def ptable(spark, tmp_path):
    root = str(tmp_path / "ptx")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    txlog.create_table(spark, root, df, partition_by=("bucket",))
    return root


def test_partitioned_layout_and_pruned_read(spark, ptable):
    """Files land under hive dirs; a partition filter eliminates
    untouched partitions at PLANNING time (inputFiles shrinks to the
    matching dirs only) and returns exactly the right rows."""
    files = txlog.snapshot_info(ptable, 0)["files"]
    assert all("/bucket=" in f for f in files)
    full = txlog.read_table(spark, ptable)
    assert full.count() == 1000
    assert dict(full.dtypes)["bucket"] == "bigint"
    pruned = txlog.read_table(spark, ptable, partitions={"bucket": [1, 2]})
    assert pruned.count() == 500
    assert all("/bucket=1/" in f or "/bucket=2/" in f
               for f in pruned.inputFiles())
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # single-value form + exactness vs the unpruned filter
    one = txlog.read_table(spark, ptable, partitions={"bucket": 3})
    expect = full.where("bucket = 3")
    assert one.exceptAll(expect).count() == 0
    assert expect.exceptAll(one).count() == 0
    with pytest.raises(ValueError, match="not partition columns"):
        txlog.read_table(spark, ptable, partitions={"id": 1})


def test_partitioned_append_delete_merge_optimize(spark, ptable):
    """Every verb preserves the hive layout and its semantics."""
    txlog.append(
        spark,
        ptable,
        spark.range(1000, 1100).select(
            F.col("id"), (F.col("id") % 4).alias("bucket")
        ),
    )
    assert txlog.read_table(spark, ptable).count() == 1100
    with pytest.raises(ValueError, match="partition columns"):
        txlog.append(spark, ptable, spark.range(3).select(F.col("id")))
    # delete with a partition predicate
    txlog.delete_where(spark, ptable, "bucket = 0 AND id < 100")
    got = txlog.read_table(spark, ptable)
    assert got.where("bucket = 0 AND id < 100").count() == 0
    assert got.count() == 1100 - 25
    # merge: replaced rows stay in their partitions
    upd = spark.range(200, 210).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    ).withColumn("id", F.col("id") + 100000)
    upd = spark.range(200, 210).select(
        F.col("id"), F.lit(7).alias("bucket")
    )
    txlog.merge(spark, ptable, upd, ("id",))
    got = txlog.read_table(spark, ptable)
    assert got.where("bucket = 7").count() == 10
    assert got.count() == 1100 - 25
    new_files = txlog.snapshot_info(
        ptable, txlog.current_version(ptable)
    )["files"]
    assert any("/bucket=7/" in f for f in new_files)
    # optimize compacts within the layout
    v = txlog.optimize(spark, ptable, target_file_bytes=1 << 20)
    files = txlog.snapshot_info(ptable, v)["files"]
    assert all("/bucket=" in f for f in files)
    assert txlog.read_table(spark, ptable).count() == 1100 - 25
    assert txlog.read_changes(spark, ptable, v - 1, v).count() == 0
    # pruned reads stay exact post-churn
    pruned = txlog.read_table(spark, ptable, partitions={"bucket": [7]})
    assert pruned.count() == 10


def test_partitioned_cdf_and_time_travel(spark, ptable):
    txlog.delete_where(spark, ptable, "bucket = 2")
    cdf = txlog.read_changes(spark, ptable, 0)
    assert cdf.where("_change_type = 'delete'").count() == 250
    assert cdf.where("bucket != 2").count() == 0
    assert (
        txlog.read_table(spark, ptable, version=0)
        .where("bucket = 2")
        .count()
        == 250
    )


# ---------------------------------------------------------------- #
# type widening
# ---------------------------------------------------------------- #

def test_type_widening_int_to_long(spark, tmp_path):
    """merge_schema widens an existing column's type when the cast is
    lossless (Delta/Iceberg ALTER COLUMN TYPE): old narrow files
    up-cast on read, time travel before the widen shows the narrow
    type, and the evolution commit records the widened schema."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 10).select(
            F.col("id").cast("int").alias("id"),
            F.lit(1).cast("int").alias("v"),
        ),
    )
    assert dict(txlog.read_table(spark, root).dtypes) == {
        "id": "int", "v": "int"
    }
    # a LONG append without merge_schema is a lossy-direction error
    wide = spark.range(10, 15).select(
        F.col("id"), F.lit(2).cast("long").alias("v")
    )
    with pytest.raises(ValueError, match="unsafe cast"):
        txlog.append(spark, root, wide)
    v = txlog.append(spark, root, wide, merge_schema=True)
    got = txlog.read_table(spark, root)
    assert dict(got.dtypes) == {"id": "bigint", "v": "bigint"}
    assert got.count() == 15
    assert got.agg(F.sum("v")).first()[0] == 10 * 1 + 5 * 2
    # time travel: the pre-widening snapshot keeps the narrow type
    old = txlog.read_table(spark, root, version=v - 1)
    assert dict(old.dtypes) == {"id": "int", "v": "int"}
    # post-widen strict appends bind to the widened schema
    txlog.append(
        spark,
        root,
        spark.range(20, 22).select(F.col("id"), F.lit(3).alias("v")),
    )
    assert txlog.read_table(spark, root).count() == 17


def test_type_widening_float_decimal_and_rejections(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 5).select(
            F.col("id"),
            F.lit(1.5).cast("float").alias("x"),
            F.lit("1.25").cast("decimal(10,2)").alias("d"),
        ),
    )
    v = txlog.append(
        spark,
        root,
        spark.range(5, 8).select(
            F.col("id"),
            F.lit(2.5).cast("double").alias("x"),
            F.lit("2.2500").cast("decimal(20,4)").alias("d"),
        ),
        merge_schema=True,
    )
    got = txlog.read_table(spark, root)
    assert dict(got.dtypes) == {
        "id": "bigint", "x": "double", "d": "decimal(20,4)"
    }
    assert got.count() == 8
    assert "schema" in _manifest(root, v)
    # incompatible in BOTH directions stays rejected even with merge
    with pytest.raises(ValueError, match="unsafe cast"):
        txlog.append(
            spark,
            root,
            spark.range(2).select(
                F.col("id"),
                F.lit("oops").alias("x"),
                F.lit("1").cast("decimal(20,4)").alias("d"),
            ),
            merge_schema=True,
        )
    # decimal that LOSES scale is rejected too
    with pytest.raises(ValueError, match="unsafe cast"):
        txlog.append(
            spark,
            root,
            spark.range(2).select(
                F.col("id"),
                F.lit(1.0).cast("double").alias("x"),
                F.lit("1").cast("decimal(20,2)").alias("d"),
            ),
            merge_schema=True,
        )


# ---------------------------------------------------------------- #
# concurrent schema evolution (round-11 ADVICE, medium)
# ---------------------------------------------------------------- #

def test_concurrent_evolutions_merge_not_clobber(spark, tmp_path, monkeypatch):
    """The lost-schema-update hazard: writer B stages an evolution
    (adds col_b), loses the commit race to writer A's evolution (adds
    col_a), and retries. B's retry must RE-DERIVE its evolution
    against A's new schema — the final schema carries BOTH columns,
    never rolling back A's. Deterministic: A's commit is injected
    inside B's first commit attempt."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark, root, spark.range(0, 10).select(F.col("id"))
    )
    df_a = spark.range(10, 15).select(
        F.col("id"), F.lit("a").alias("col_a")
    )
    df_b = spark.range(20, 25).select(
        F.col("id"), F.lit("b").alias("col_b")
    )
    orig = txlog._try_commit
    state = {"injected": False}

    def racing_commit(r, version, manifest):
        if not state["injected"] and r == root:
            state["injected"] = True
            # writer A wins this version with ITS OWN evolution
            txlog.append(spark, root, df_a, merge_schema=True)
            # B's attempt now loses the race (version taken)
        return orig(r, version, manifest)

    monkeypatch.setattr(txlog, "_try_commit", racing_commit)
    txlog.append(spark, root, df_b, merge_schema=True)
    monkeypatch.setattr(txlog, "_try_commit", orig)
    assert state["injected"]
    assert txlog.current_version(root) == 2
    got = txlog.read_table(spark, root)
    assert set(got.columns) == {"id", "col_a", "col_b"}  # neither lost
    assert got.where("col_a = 'a'").count() == 5
    assert got.where("col_b = 'b'").count() == 5
    assert got.count() == 20


def test_threaded_concurrent_evolutions(spark, tmp_path):
    """The same property under a real thread race (whichever
    interleaving happens, both columns and both payloads survive)."""
    root = str(tmp_path / "tx")
    txlog.create_table(spark, root, spark.range(0, 10).select(F.col("id")))
    errs: list[Exception] = []

    def add(col: str, lo: int) -> None:
        try:
            df = spark.range(lo, lo + 5).select(
                F.col("id"), F.lit(col).alias(col)
            )
            txlog.append(spark, root, df, merge_schema=True)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=add, args=("col_a", 100))
    t2 = threading.Thread(target=add, args=("col_b", 200))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    got = txlog.read_table(spark, root)
    assert set(got.columns) == {"id", "col_a", "col_b"}
    assert got.where("col_a IS NOT NULL").count() == 5
    assert got.where("col_b IS NOT NULL").count() == 5


# ---------------------------------------------------------------- #
# commit-point hardening (round-11 ADVICE, low)
# ---------------------------------------------------------------- #

def test_commit_survives_vacuum_swept_temp(spark, tmp_path, monkeypatch):
    """A temp manifest swept by a racing vacuum mid-stall surfaces as
    FileNotFoundError from os.link; the commit rewrites the temp and
    retries instead of crashing (a lost temp is a race, not a crashed
    commit)."""
    root = str(tmp_path / "tx")
    txlog.create_table(spark, root, spark.range(0, 10).select(F.col("id")))
    real_link = os.link
    state = {"raced": False}

    def sweeping_link(src, dst, **kw):
        if not state["raced"] and txlog._LOG in src:
            state["raced"] = True
            os.unlink(src)  # the racing vacuum sweeps our temp
            raise FileNotFoundError(src)
        return real_link(src, dst, **kw)

    monkeypatch.setattr(os, "link", sweeping_link)
    v = txlog.append(spark, root, spark.range(10, 15).select(F.col("id")))
    monkeypatch.setattr(os, "link", real_link)
    assert state["raced"]
    assert v == 1
    assert txlog.read_table(spark, root).count() == 15


def test_post_link_fsync_failure_is_still_committed(
    spark, tmp_path, monkeypatch
):
    """Once the link lands the version IS published: a directory-fsync
    error afterwards must not propagate (a retrying caller would
    double-commit at N+1)."""
    root = str(tmp_path / "tx")
    txlog.create_table(spark, root, spark.range(0, 10).select(F.col("id")))

    def broken_fsync(path):
        raise OSError("fsync of directory fd not supported here")

    monkeypatch.setattr(txlog, "_fsync_dir", broken_fsync)
    v = txlog.append(spark, root, spark.range(10, 15).select(F.col("id")))
    assert v == 1
    assert txlog.read_table(spark, root).count() == 15


def test_merge_rejects_null_keys(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 10).select(F.col("id"), F.lit(0).alias("bucket")),
    )
    bad = spark.range(0, 3).select(
        F.when(F.col("id") == 1, None).otherwise(F.col("id")).alias("id"),
        F.lit(-1).alias("bucket"),
    )
    with pytest.raises(ValueError, match="NULL-key"):
        txlog.merge(spark, root, bad, ("id",))
    assert txlog.current_version(root) == 0  # nothing committed


# ---------------------------------------------------------------- #
# vacuum retention contract
# ---------------------------------------------------------------- #

def test_vacuum_refuses_zero_retention_and_pins_hazard(spark, tmp_path):
    """retain_versions=0 is refused (it would delete the current
    snapshot's files); after vacuum(retain_versions=1) a reader pinned
    at an OLDER version fails loudly once its files are gone — the
    documented Delta VACUUM hazard — while retained versions keep
    reading."""
    root = str(tmp_path / "tx")
    txlog.create_table(spark, root, spark.range(0, 100).select(F.col("id")))
    txlog.optimize(spark, root)  # v1: all of v0's files now unreferenced
    with pytest.raises(ValueError, match="retain_versions"):
        txlog.vacuum(root, retain_versions=0)
    pinned = txlog.read_table(spark, root, version=0)
    removed = txlog.vacuum(root, retain_versions=1)
    assert removed
    assert txlog.read_table(spark, root).count() == 100  # current intact
    with pytest.raises(Exception):  # noqa: B017 — files gone mid-scan
        pinned.count()


def test_columnar_sidecar_checkpoints(spark, tmp_path, monkeypatch):
    """Above SIDECAR_MIN_FILES, full manifests move their file list +
    stats into a parquet sidecar (the Delta parquet-checkpoint shape):
    the JSON manifest stays O(1) bytes, resolution / time travel /
    CDF / restore / stats pruning all read through the sidecar, and
    vacuum sweeps only ORPHAN sidecars (crashed or raced checkpoint
    writers), never referenced ones."""
    monkeypatch.setattr(txlog, "SIDECAR_MIN_FILES", 5)
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 1000).select(
            F.col("id"), (F.col("id") % 4).alias("bucket")
        ).repartition(8),
        checkpoint_every=3,
    )
    m0 = _manifest(root, 0)
    assert "files_ref" in m0 and "files" not in m0 and "stats" not in m0
    assert os.path.getsize(txlog._manifest_path(root, 0)) < 2000
    snap = txlog.snapshot_info(root, 0)
    assert len(snap["files"]) == 8
    assert set(snap["stats"]) == set(snap["files"])  # stats via sidecar
    for i in range(4):
        txlog.append(
            spark,
            root,
            spark.range(1000 + i * 10, 1010 + i * 10).select(
                F.col("id"), F.lit(9).alias("bucket")
            ),
        )
    m3 = _manifest(root, 3)  # checkpoint at the cadence -> sidecar
    assert m3.get("checkpoint") is True and "files_ref" in m3
    assert txlog.read_table(spark, root).count() == 1040
    assert txlog.read_table(spark, root, version=2).count() == 1020
    cdf = txlog.read_changes(spark, root, 0)
    assert cdf.count() == 40
    assert cdf.where("_change_type != 'insert'").count() == 0
    # stats survive through the sidecar for planning-time pruning
    pruned = txlog.scan_table(spark, root, "id", 1000, 1005)
    assert pruned.count() == 6
    assert len(pruned.inputFiles()) < len(
        txlog.snapshot_info(root, txlog.current_version(root))["files"]
    )
    # restore resolves the sidecar-backed target
    v = txlog.restore(spark, root, 0)
    assert txlog.read_table(spark, root).count() == 1000
    assert _manifest(root, v).get("files_ref") or _manifest(root, v).get(
        "files"
    )
    # orphan sidecar sweep: aged + unreferenced -> removed; aged +
    # referenced -> kept
    import time as _time

    log_dir = txlog._log_dir(root)
    orphan = os.path.join(log_dir, ".ckpt-deadbeef0000.parquet")
    with open(orphan, "wb") as fh:
        fh.write(b"xx")
    old = _time.time() - 2 * txlog._TMP_RETAIN_SECS
    os.utime(orphan, (old, old))
    ref = os.path.join(log_dir, m0["files_ref"])
    os.utime(ref, (old, old))
    removed = txlog.vacuum(root)
    assert any(".ckpt-deadbeef0000" in r for r in removed)
    assert os.path.exists(ref)
    assert txlog.read_table(spark, root, version=0).count() == 1000


def test_dv_map_spills_into_sidecar(spark, tmp_path, monkeypatch):
    """Round-12 ADVICE: a checkpoint whose FILE LIST spilled to the
    parquet sidecar must not re-inline its deletion-vector map as
    manifest JSON — the dv refs ride the sidecar's dv_ref column, the
    manifest stays O(1) bytes, and every dv consumer (snapshot reads,
    CDF, the streaming source, vacuum's sidecar protection) resolves
    them through _full_dv."""
    monkeypatch.setattr(txlog, "SIDECAR_MIN_FILES", 5)
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 1000)
        .select(F.col("id"), (F.col("id") % 4).alias("bucket"))
        .repartition(8),
        checkpoint_every=2,
    )
    txlog.delete_where(spark, root, "id IN (7, 501)", mode="dv")  # v1 delta
    txlog.append(  # v2: checkpoint cadence -> FULL sidecar manifest
        spark,
        root,
        spark.range(1000, 1010).select(F.col("id"), F.lit(9).alias("bucket")),
    )
    m2 = _manifest(root, 2)
    assert m2.get("checkpoint") is True and "files_ref" in m2
    assert "dv" not in m2  # spilled, not inlined
    snap = txlog.snapshot_info(root, 2)
    assert len(snap["dv"]) > 0  # resolved through the sidecar
    got = txlog.read_table(spark, root)
    assert got.count() == 1008
    assert got.where("id IN (7, 501)").count() == 0
    # CDF across the sidecar checkpoint keeps the dv continuity:
    # replaying from v1 must NOT re-emit the v1 deletes
    cdf = txlog.read_changes(spark, root, 1)
    assert cdf.where("_change_type = 'delete'").count() == 0
    assert cdf.count() == 10
    # metadata row_count subtracts spilled vectors too
    assert txlog.row_count(root) == 1008
    # vacuum never sweeps the sidecar-referenced dv file
    import time as _time

    log_dir = txlog._log_dir(root)
    refs = txlog._full_dv(root, m2)
    dv_file = os.path.join(log_dir, next(iter(refs.values())))
    old = _time.time() - 2 * txlog._TMP_RETAIN_SECS
    os.utime(dv_file, (old, old))
    txlog.vacuum(root)
    assert os.path.exists(dv_file)
    assert txlog.read_table(spark, root).count() == 1008


# ---------------------------------------------------------------- #
# CLONE (hardlink shallow clone)
# ---------------------------------------------------------------- #

def test_clone_zero_copy_and_independent_evolution(spark, tmp_path):
    """Clone = the source snapshot's content for zero copied bytes
    (hard links, verified by inode identity); afterwards the tables
    evolve independently, stats/schema/config carry over, and — the
    upgrade over Delta's shallow clone — VACUUMING THE SOURCE cannot
    break the clone (inode refcounts), nor vice versa."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    txlog.create_table(
        spark,
        src,
        spark.range(0, 1000).select(
            F.col("id"), (F.col("id") % 10).alias("bucket")
        ).repartition(4),
    )
    txlog.optimize(spark, src, target_file_bytes=4 << 10, cluster_by=("id",))
    v = txlog.clone_table(spark, src, dst)
    assert v == 0
    got = txlog.read_table(spark, dst)
    assert got.count() == 1000
    # zero-copy: every clone file shares its source inode
    src_inodes = {
        os.stat(os.path.join(src, r)).st_ino
        for r in txlog.snapshot_info(src, 1)["files"]
    }
    dst_files = txlog.snapshot_info(dst, 0)["files"]
    assert all(
        os.stat(os.path.join(dst, r)).st_ino in src_inodes
        for r in dst_files
    )
    # stats carried: the clone's key-range scan still plans pruned
    pruned = txlog.scan_table(spark, dst, "id", 100, 160)
    assert pruned.count() == 61
    assert len(pruned.inputFiles()) < len(dst_files)
    # independent evolution: delete on the clone, append on the source
    txlog.delete_where(spark, dst, "bucket = 3")
    txlog.append(
        spark,
        src,
        spark.range(5000, 5100).select(F.col("id"), F.lit(0).alias("bucket")),
    )
    assert txlog.read_table(spark, dst).count() == 900
    assert txlog.read_table(spark, src).count() == 1100
    # source vacuum (drops the clone-shared pre-optimize files AND,
    # after another optimize, the very files the clone links) must
    # not break the clone
    txlog.optimize(spark, src)
    txlog.vacuum(src, retain_versions=1)
    assert txlog.read_table(spark, dst).count() == 900
    # clone vacuum must not break the source
    txlog.vacuum(dst, retain_versions=1)
    assert txlog.read_table(spark, src).count() == 1100
    with pytest.raises(FileExistsError):
        txlog.clone_table(spark, src, dst)


def test_clone_partitioned_and_pinned_version(spark, tmp_path):
    """Cloning a partitioned table at a PINNED version carries the
    hive layout + partition pruning; the clone shows the pinned
    snapshot, not the source head."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    txlog.create_table(
        spark,
        src,
        spark.range(0, 400).select(
            F.col("id"), (F.col("id") % 4).alias("bucket")
        ),
        partition_by=("bucket",),
    )
    txlog.delete_where(spark, src, "bucket = 0")  # v1
    txlog.clone_table(spark, src, dst, version=0)  # pre-delete snapshot
    got = txlog.read_table(spark, dst)
    assert got.count() == 400
    assert got.where("bucket = 0").count() == 100
    pruned = txlog.read_table(spark, dst, partitions={"bucket": [1]})
    assert pruned.count() == 100
    assert all("/bucket=1/" in f for f in pruned.inputFiles())
    # the clone keeps the source's partition config for its own writes
    txlog.append(
        spark,
        dst,
        spark.range(400, 420).select(
            F.col("id"), (F.col("id") % 4).alias("bucket")
        ),
    )
    assert all(
        "/bucket=" in f
        for f in txlog.snapshot_info(dst, 1)["files"]
    )
    hist = txlog.history(spark, dst).orderBy("version").first()
    import json as _json

    detail = _json.loads(hist["detail"])
    assert detail["cloned_version"] == 0
    assert detail["cloned_from"].endswith("src")


# ---------------------------------------------------------------- #
# OPTIMIZE ZORDER
# ---------------------------------------------------------------- #

def test_optimize_zorder_prunes_both_dimensions(spark, tmp_path):
    """OPTIMIZE ZORDER as a commit: after 4 scattered round-robin
    files (every file spans the full range of BOTH columns), a
    Z-ordered optimize gives each file a small hyper-rectangle — a
    narrow predicate on EITHER column overlaps at most half the
    files' manifest stats, where 1-D clustering would prune only its
    leading column. Logical content identical; manifest records the
    zorder_by detail; scan_table plans pruned on both columns."""
    root = str(tmp_path / "tx")
    side = 64
    txlog.create_table(
        spark,
        root,
        spark.range(0, side * side).select(
            (F.col("id") % side).alias("x"),
            (F.col("id") / side).cast("long").alias("y"),
            F.col("id").alias("payload"),
        ).repartition(4),
    )
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for f in txlog.snapshot_info(root, 0)["files"]
    )
    v = txlog.optimize(
        spark,
        root,
        target_file_bytes=max(1 << 10, total // 16),
        zorder_by=("x", "y"),
    )
    m = _manifest(root, v)
    assert m["zorder_by"] == ["x", "y"]
    snap = txlog.snapshot_info(root, v)
    n_files = len(snap["files"])
    assert n_files >= 8

    def overlapping(col, lo, hi):
        return sum(
            1
            for rel in snap["files"]
            if (rng := snap["stats"][rel].get(col)) is not None
            and rng[0] <= hi
            and rng[1] >= lo
        )

    # a 4/64 band on EITHER axis overlaps a clear minority of the
    # z-blocks (60% bound absorbs range-sampling variance; 1-D
    # clustering would put the second dimension at 100%)
    assert overlapping("x", 10, 13) <= (n_files * 3) // 5
    assert overlapping("y", 10, 13) <= (n_files * 3) // 5
    # content identical + both-dimension planning-time pruning
    got = txlog.read_table(spark, root)
    assert got.count() == side * side
    assert got.agg(F.sum("payload")).first()[0] == (
        side * side * (side * side - 1) // 2
    )
    for col in ("x", "y"):
        scanned = txlog.scan_table(spark, root, col, 10, 13)
        assert scanned.count() == 4 * side
        assert len(scanned.inputFiles()) <= (n_files * 3) // 5


# ---------------------------------------------------------------- #
# CHECK constraints, metadata row counts, time-based retention
# ---------------------------------------------------------------- #

def test_check_constraints_enforced_on_append_and_merge(spark, tmp_path):
    """ADD CONSTRAINT validates existing data first (a violated rule
    is refused), then every append/merge validates its batch in one
    agg job; NULL predicate results pass (SQL CHECK semantics); DROP
    lifts the rule; constraints survive clones and appear in
    history."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 100).select(F.col("id"), F.lit(5).alias("bucket")),
    )
    # a rule the existing rows violate is refused outright
    with pytest.raises(ValueError, match="violation.*100 rows"):
        txlog.add_constraint(spark, root, "neg", "bucket < 0")
    v = txlog.add_constraint(spark, root, "bucket_range", "bucket BETWEEN 0 AND 9")
    assert txlog.constraints(root) == {"bucket_range": "bucket BETWEEN 0 AND 9"}
    # violating append fails loudly, table unchanged
    with pytest.raises(ValueError, match="bucket_range"):
        txlog.append(
            spark,
            root,
            spark.range(100, 110).select(F.col("id"), F.lit(42).alias("bucket")),
        )
    assert txlog.current_version(root) == v
    assert txlog.read_table(spark, root).count() == 100
    # conforming append passes; NULLs pass (SQL CHECK)
    txlog.append(
        spark,
        root,
        spark.range(100, 105).select(
            F.col("id"),
            F.when(F.col("id") == 101, None).otherwise(F.lit(3)).alias("bucket"),
        ),
    )
    assert txlog.read_table(spark, root).count() == 105
    # violating merge fails; conforming merge passes
    with pytest.raises(ValueError, match="bucket_range"):
        txlog.merge(
            spark,
            root,
            spark.range(0, 3).select(F.col("id"), F.lit(-7).alias("bucket")),
            ("id",),
        )
    txlog.merge(
        spark,
        root,
        spark.range(0, 3).select(F.col("id"), F.lit(9).alias("bucket")),
        ("id",),
    )
    assert txlog.read_table(spark, root).where("bucket = 9").count() == 3
    # constraints travel with clones
    clone = str(tmp_path / "clone")
    txlog.clone_table(spark, root, clone)
    assert txlog.constraints(clone) == txlog.constraints(root)
    with pytest.raises(ValueError, match="bucket_range"):
        txlog.append(
            spark,
            clone,
            spark.range(500, 502).select(F.col("id"), F.lit(99).alias("bucket")),
        )
    # drop lifts the rule
    txlog.drop_constraint(spark, root, "bucket_range")
    assert txlog.constraints(root) == {}
    txlog.append(
        spark,
        root,
        spark.range(200, 202).select(F.col("id"), F.lit(99).alias("bucket")),
    )
    with pytest.raises(ValueError, match="no such constraint"):
        txlog.drop_constraint(spark, root, "bucket_range")
    ops = [r["op"] for r in txlog.history(spark, root).orderBy("version").collect()]
    assert "add_constraint" in ops and "drop_constraint" in ops


def test_concurrent_add_constraint_revalidates_staged_batch(
    spark, tmp_path, monkeypatch
):
    """A constraint committed BETWEEN a writer's staging and its
    commit retry must still gate that writer: the retry re-validates
    the already-staged batch against the new rule and fails instead
    of committing around it."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 10).select(F.col("id"), F.lit(1).alias("bucket")),
    )
    bad = spark.range(10, 15).select(F.col("id"), F.lit(77).alias("bucket"))
    orig = txlog._try_commit
    state = {"injected": False}

    def racing_commit(r, version, manifest):
        if not state["injected"] and r == root and manifest.get("op") == "append":
            state["injected"] = True
            txlog.add_constraint(spark, root, "small", "bucket < 50")
        return orig(r, version, manifest)

    monkeypatch.setattr(txlog, "_try_commit", racing_commit)
    with pytest.raises(ValueError, match="small"):
        txlog.append(spark, root, bad)
    monkeypatch.setattr(txlog, "_try_commit", orig)
    assert state["injected"]
    assert txlog.read_table(spark, root).where("bucket = 77").count() == 0


def test_metadata_row_count(spark, tmp_path):
    """COUNT(*) from manifest metadata alone — exact across create /
    append / delete / merge / optimize / clone, zero Spark jobs."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("bucket")),
    )
    assert txlog.row_count(root) == 1000
    txlog.append(spark, root, spark.range(1000, 1234).select(
        F.col("id"), F.lit(1).alias("bucket")))
    assert txlog.row_count(root) == 1234
    txlog.delete_where(spark, root, "bucket = 3")
    expect = txlog.read_table(spark, root).count()
    assert txlog.row_count(root) == expect
    txlog.merge(
        spark,
        root,
        spark.range(5000, 5010).select(F.col("id"), F.lit(0).alias("bucket")),
        ("id",),
    )
    assert txlog.row_count(root) == expect + 10
    txlog.optimize(spark, root)
    assert txlog.row_count(root) == expect + 10
    # time travel counts too
    assert txlog.row_count(root, version=0) == 1000
    clone = str(tmp_path / "clone")
    txlog.clone_table(spark, root, clone)
    assert txlog.row_count(clone) == expect + 10


def test_vacuum_retain_hours_keeps_recent_versions(spark, tmp_path):
    """Time-based retention: versions committed inside the window keep
    their files even when retain_versions alone would drop them."""
    import json as _json

    root = str(tmp_path / "tx")
    txlog.create_table(spark, root, spark.range(0, 50).select(F.col("id")))
    txlog.optimize(spark, root)  # v1 rewrites everything
    # v2: cluster_by forces a real rewrite commit (a bare re-optimize
    # of one right-sized file is a round-12 no-op by design)
    txlog.optimize(spark, root, target_file_bytes=1 << 30, cluster_by=("id",))
    # age v0's manifest far outside the window (rewrite its ts)
    p = txlog._manifest_path(root, 0)
    m = _json.load(open(p))
    m["ts"] = m["ts"] - 100 * 3600
    with open(p, "w") as fh:
        _json.dump(m, fh)
    removed = txlog.vacuum(root, retain_versions=1, retain_hours=48)
    # v1 + v2 are inside the 48h window: both stay readable;
    # v0 (aged out AND beyond retain_versions) lost its files
    assert txlog.read_table(spark, root, version=1).count() == 50
    assert txlog.read_table(spark, root, version=2).count() == 50
    assert removed, "v0's unshared files should have been vacuumed"


def test_scan_table_prunes_on_partition_column(spark, ptable):
    """scan_table on a PARTITION column prunes by hive path values
    (partition columns have no footer stats): a 2-value range plans
    only those partitions' files, result exact."""
    scanned = txlog.scan_table(spark, ptable, "bucket", 1, 2)
    assert scanned.count() == 500
    assert all(
        "/bucket=1/" in f or "/bucket=2/" in f
        for f in scanned.inputFiles()
    )
    full_n = len(txlog.read_table(spark, ptable).inputFiles())
    assert 0 < len(scanned.inputFiles()) < full_n


def test_read_changes_partition_filtered(spark, ptable):
    """A partition-filtered change feed pays only its partition's
    changes: touched-file lists are path-pruned per commit before any
    read, and the rows match the unfiltered feed's subset exactly."""
    txlog.append(
        spark,
        ptable,
        spark.range(1000, 1100).select(
            F.col("id"), (F.col("id") % 4).alias("bucket")
        ),
    )  # v1: 25 rows per bucket
    txlog.delete_where(spark, ptable, "bucket = 2 AND id < 50")  # v2
    feed = txlog.read_changes(spark, ptable, 0, partitions={"bucket": 2})
    assert feed.where("bucket != 2").count() == 0
    by = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by["insert"] == 25  # v1's bucket-2 slice only
    assert by["delete"] == 12  # ids {2,6,...,46} in bucket 2
    # planning-time: only bucket=2 files were read
    assert all("/bucket=2/" in f for f in feed.inputFiles())
    # equals the unfiltered feed's subset
    full = txlog.read_changes(spark, ptable, 0).where("bucket = 2")
    assert feed.exceptAll(full).count() == 0
    assert full.exceptAll(feed).count() == 0


# ---------------------------------------------------------------- #
# multi-writer stress
# ---------------------------------------------------------------- #

def test_four_concurrent_writers_mixed_verbs_serialize(spark, tmp_path):
    """4 writers race append -> merge -> append chains on DISJOINT row
    sets (operations on disjoint rows commute, so the final state is
    deterministic under ANY serialization): the optimistic-commit
    protocol must serialize all 12 commits with no lost updates, no
    extra versions, and every loser's re-probe/re-stage landing on
    top of whatever interleaving happened."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 50).select(F.col("id"), F.lit(-1).alias("bucket")),
    )
    errs: list[Exception] = []

    def work(t: int) -> None:
        try:
            lo = 10_000 * (t + 1)
            txlog.append(
                spark,
                root,
                spark.range(lo, lo + 100).select(
                    F.col("id"), F.lit(t).alias("bucket")
                ),
            )
            txlog.merge(
                spark,
                root,
                spark.range(lo, lo + 50).select(
                    F.col("id"), F.lit(100 + t).alias("bucket")
                ),
                ("id",),
            )
            txlog.append(
                spark,
                root,
                spark.range(lo + 200, lo + 250).select(
                    F.col("id"), F.lit(200 + t).alias("bucket")
                ),
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=work, args=(t,)) for t in range(4)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs
    assert txlog.current_version(root) == 12  # create + exactly 12 commits
    got = txlog.read_table(spark, root)
    assert got.count() == 50 + 4 * 150
    for t in range(4):
        assert got.where(f"bucket = {t}").count() == 50
        assert got.where(f"bucket = {100 + t}").count() == 50
        assert got.where(f"bucket = {200 + t}").count() == 50
    assert got.where("bucket = -1").count() == 50  # base rows untouched
    # metadata ledger stayed exact through the races
    assert txlog.row_count(root) == 50 + 4 * 150


# ---------------------------------------------------------------- #
# degenerate inputs for the round-11 verbs
# ---------------------------------------------------------------- #

def test_round11_verbs_on_empty_and_degenerate_tables(spark, tmp_path):
    """Edge hardening: every round-11 verb behaves on an EMPTY table
    (typed empty create), a table emptied by delete, and 1-row
    tables — no crashes, exact metadata, sane clones."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0).select(F.col("id"), F.lit(0).alias("bucket")),
    )
    # metadata count of a zero-file snapshot
    assert txlog.row_count(root) == 0
    # constraints on an empty table: add validates vacuously, then
    # gates the first real append
    txlog.add_constraint(spark, root, "pos", "id >= 0")
    with pytest.raises(ValueError, match="pos"):
        txlog.append(
            spark,
            root,
            spark.range(1).select(F.lit(-5).alias("id"), F.lit(0).alias("bucket")),
        )
    txlog.append(
        spark,
        root,
        spark.range(0, 3).select(F.col("id"), F.lit(1).alias("bucket")),
    )
    assert txlog.row_count(root) == 3
    # zorder optimize on a tiny table (calibration agg sees 3 rows)
    v = txlog.optimize(spark, root, zorder_by=("id", "bucket"))
    assert txlog.read_table(spark, root).count() == 3
    # clone of a table whose history includes an empty snapshot
    clone = str(tmp_path / "clone")
    txlog.clone_table(spark, root, clone, version=0)  # the EMPTY v0
    assert txlog.read_table(spark, clone).count() == 0
    assert txlog.row_count(clone) == 0
    assert txlog.constraints(clone) == {}  # v0 predates the constraint
    # zero-ROW zorder optimize (the empty create still staged a part
    # file): falls back to plain compaction, content stays empty
    v_c = txlog.optimize(spark, clone, zorder_by=("id",))
    assert txlog.read_table(spark, clone, version=v_c).count() == 0
    # scan_table on the empty clone: typed empty, no crash
    assert txlog.scan_table(spark, clone, "id", 0, 10).count() == 0
    # delete everything, then CLONE the emptied head
    txlog.delete_where(spark, root, "id >= 0")
    assert txlog.row_count(root) == 0
    clone2 = str(tmp_path / "clone2")
    txlog.clone_table(spark, root, clone2)
    got = txlog.read_table(spark, clone2)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id", "bucket"]
    # the emptied head still carries the constraint into the clone
    assert txlog.constraints(clone2) == {"pos": "id >= 0"}
    # partition-filtered CDF over a table with zero matching commits
    proot = str(tmp_path / "ptx")
    txlog.create_table(
        spark,
        proot,
        spark.range(0, 8).select(F.col("id"), (F.col("id") % 2).alias("p")),
        partition_by=("p",),
    )
    feed = txlog.read_changes(spark, proot, -1, partitions={"p": 1})
    assert feed.count() == 4
    none = txlog.read_changes(spark, proot, -1, partitions={"p": 7})
    assert none.count() == 0


def test_row_count_legacy_table_returns_none(spark, tmp_path):
    """A table whose stats predate the #rows recording (legacy
    writers) answers None — the caller falls back to a real count,
    never a silently wrong metadata number."""
    import json as _json

    root = str(tmp_path / "tx")
    txlog.create_table(spark, root, spark.range(0, 20).select(F.col("id")))
    p = txlog._manifest_path(root, 0)
    m = _json.load(open(p))
    for rel in m["files"]:
        m["stats"].get(rel, {}).pop("#rows", None)
    with open(p, "w") as fh:
        _json.dump(m, fh)
    assert txlog.row_count(root) is None
    assert txlog.read_table(spark, root).count() == 20  # the fallback
