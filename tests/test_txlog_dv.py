"""Deletion-vector (merge-on-read delete) contracts — round-12
verdict item 3. The design under test: ``delete_where(mode="dv")``
commits O(deleted rows) of metadata (one sidecar of per-file row
positions) and rewrites ZERO data files; every reader anti-joins the
vectors out; OPTIMIZE materializes them; the change feed, time
travel, restore, clone, merge, and row_count all stay exact."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tx")
    df = spark.range(0, 1000).select(
        "id", (F.col("id") % 10).alias("bucket")
    )
    txlog.create_table(spark, root, df.repartition(4))
    return root


def _inode_map(root: str, version: int) -> dict[str, int]:
    return {
        rel: os.stat(os.path.join(root, rel)).st_ino
        for rel in txlog.snapshot_info(root, version)["files"]
    }


def test_dv_delete_rewrites_zero_files(spark, table):
    before = _inode_map(table, 0)
    v = txlog.delete_where(spark, table, "bucket = 3", mode="dv")
    after = _inode_map(table, v)
    # the file list AND the physical files are bit-identical
    assert after == before, "dv delete must not touch any data file"
    m = txlog._read_manifest(table, v)
    assert m["rewrote"] == 0 and m["mode"] == "dv" and m["dv_rows"] == 100
    got = txlog.read_table(spark, table)
    assert got.count() == 900
    assert got.where("bucket = 3").count() == 0
    # time travel below the delete still sees everything
    assert txlog.read_table(spark, table, version=0).count() == 1000


def test_dv_deletes_accumulate_and_row_count_subtracts(spark, table):
    txlog.delete_where(spark, table, "bucket = 3", mode="dv")
    txlog.delete_where(spark, table, "id < 50", mode="dv")
    got = txlog.read_table(spark, table)
    expect = 1000 - 100 - (50 - 5)  # bucket3 = 100; id<50 minus overlap
    assert got.count() == expect
    assert txlog.row_count(table) == expect  # metadata-only COUNT
    # idempotent overlap: re-deleting the same rows changes nothing
    txlog.delete_where(spark, table, "bucket = 3", mode="dv")
    assert txlog.read_table(spark, table).count() == expect
    assert txlog.row_count(table) == expect


def test_dv_scan_table_filters_dead_rows(spark, table):
    txlog.delete_where(spark, table, "id >= 100 AND id < 200", mode="dv")
    got = txlog.scan_table(spark, table, "id", 50, 250)
    assert got.count() == (250 - 50 + 1) - 100
    assert got.where("id = 150").count() == 0


def test_dv_cdf_emits_deletes_and_optimize_cancels(spark, table):
    txlog.delete_where(spark, table, "bucket = 3", mode="dv")  # v1
    cdf = txlog.read_changes(spark, table, from_version=0, to_version=1)
    rows = cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    assert {r["_change_type"]: r["n"] for r in rows} == {"delete": 100}
    assert cdf.where("bucket <> 3").count() == 0
    # optimize materializes: vectors cleared, feed across it is empty
    v = txlog.optimize(spark, table)
    assert txlog.snapshot_info(table, v)["dv"] == {}
    assert (
        txlog.read_changes(spark, table, from_version=v - 1).count() == 0
    )
    assert txlog.read_table(spark, table).count() == 900


def test_dv_merge_does_not_resurrect_deleted_rows(spark, table):
    txlog.delete_where(spark, table, "bucket = 3", mode="dv")
    # id=3 (bucket 3) is dead; a merge on OTHER keys must not revive
    # it through a victim-file rewrite
    upd = spark.createDataFrame([(4, -1)], ["id", "bucket"])
    txlog.merge(spark, table, upd, ("id",))
    got = txlog.read_table(spark, table)
    assert got.where("id = 3").count() == 0
    assert got.where("id = 4").collect()[0]["bucket"] == -1
    assert got.count() == 900
    # and a merge ON a dead key is an insert (the row no longer exists)
    txlog.merge(
        spark, table, spark.createDataFrame([(3, -2)], ["id", "bucket"]),
        ("id",),
    )
    got = txlog.read_table(spark, table)
    assert got.where("id = 3").collect()[0]["bucket"] == -2
    assert got.count() == 901


def test_dv_cow_delete_materializes_touched_files(spark, table):
    """A later cow delete on a dv'd file must not resurrect the dv'd
    rows: the rewrite reads through the vector."""
    txlog.delete_where(spark, table, "id = 13", mode="dv")  # bucket 3
    txlog.delete_where(spark, table, "bucket = 5")  # cow, rewrites all files
    got = txlog.read_table(spark, table)
    assert got.where("id = 13").count() == 0
    assert got.count() == 1000 - 1 - 100


def test_dv_restore_rolls_vectors_back_and_forward(spark, table):
    txlog.delete_where(spark, table, "bucket = 3", mode="dv")  # v1
    txlog.delete_where(spark, table, "bucket = 7", mode="dv")  # v2
    txlog.restore(spark, table, 1)  # v3: undo the bucket-7 delete
    assert txlog.read_table(spark, table).count() == 900
    cdf = txlog.read_changes(spark, table, from_version=2, to_version=3)
    rows = {r["_change_type"]: r["n"] for r in
            cdf.groupBy("_change_type").agg(F.count("*").alias("n")).collect()}
    assert rows == {"insert": 100}  # the bucket-7 rows return
    assert cdf.where("bucket <> 7").count() == 0
    txlog.restore(spark, table, 0)  # v4: undo everything
    assert txlog.read_table(spark, table).count() == 1000
    assert txlog.row_count(table) == 1000


def test_dv_clone_carries_vectors(spark, tmp_path, table):
    txlog.delete_where(spark, table, "bucket = 3", mode="dv")
    dst = str(tmp_path / "clone")
    txlog.clone_table(spark, table, dst)
    assert txlog.read_table(spark, dst).count() == 900
    assert txlog.read_table(spark, dst).where("bucket = 3").count() == 0
    assert txlog.row_count(dst) == 900
    # clone stays frozen while the source optimizes + vacuums
    txlog.optimize(spark, table)
    txlog.vacuum(table, retain_versions=1)
    assert txlog.read_table(spark, dst).count() == 900


def test_dv_partitioned_table_prunes_and_filters(spark, tmp_path):
    root = str(tmp_path / "tx")
    df = spark.range(0, 300).select(
        "id", (F.col("id") % 3).alias("p")
    )
    txlog.create_table(spark, root, df, partition_by=("p",))
    txlog.delete_where(spark, root, "id < 30", mode="dv")
    got = txlog.read_table(spark, root, partitions={"p": 1})
    assert got.count() == 100 - 10
    # partition-scoped CDF sees only its own partition's dv deletes
    cdf = txlog.read_changes(
        spark, root, from_version=0, partitions={"p": 1}
    )
    assert cdf.count() == 10
    assert cdf.where("p <> 1").count() == 0


def test_dv_sidecar_vacuum_keeps_referenced(spark, table, tmp_path):
    import time as _time

    txlog.delete_where(spark, table, "bucket = 3", mode="dv")
    log_dir = txlog._log_dir(table)
    refs = [n for n in os.listdir(log_dir) if n.startswith(".dv-")]
    assert len(refs) == 1
    # an orphan dv sidecar (crashed writer) ages into removal; the
    # referenced one is immortal
    orphan = os.path.join(log_dir, ".dv-deadbeefdead.json")
    with open(orphan, "w") as fh:
        fh.write("{}")
    old = _time.time() - 2 * txlog._TMP_RETAIN_SECS
    os.utime(orphan, (old, old))
    removed = txlog.vacuum(table, retain_versions=10)
    assert f"{txlog._LOG}/.dv-deadbeefdead.json" in removed
    assert os.path.exists(os.path.join(log_dir, refs[0]))
    assert txlog.read_table(spark, table).count() == 900


def test_dv_merge_rewrites_zero_files(spark, table):
    """mode='dv' MERGE: matched rows become vector entries, updates
    append, nothing is rewritten — and the result is row-identical to
    the copy-on-write merge."""
    before = _inode_map(table, 0)
    upd = spark.createDataFrame(
        [(3, -1), (500, -2), (5000, -3)], ["id", "bucket"]
    )  # two updates + one pure insert
    v = txlog.merge(spark, table, upd, ("id",), mode="dv")
    m = txlog._read_manifest(table, v)
    assert m["mode"] == "dv" and m["rewrote"] == 0 and m["dv_rows"] == 2
    # every v0 file carried untouched; only new append files added
    after = _inode_map(table, v)
    assert all(after[r] == i for r, i in before.items())
    got = txlog.read_table(spark, table)
    assert got.count() == 1001
    assert {
        r["id"]: r["bucket"]
        for r in got.where("id IN (3, 500, 5000)").collect()
    } == {3: -1, 500: -2, 5000: -3}
    # CDF: each update is its delete+insert pair, the insert is alone
    cdf = txlog.read_changes(spark, table, from_version=0)
    rows = {
        (r["_change_type"], r["id"], r["bucket"]) for r in cdf.collect()
    }
    assert ("delete", 3, 3) in rows and ("insert", 3, -1) in rows
    assert ("delete", 500, 0) in rows and ("insert", 500, -2) in rows
    assert ("insert", 5000, -3) in rows
    assert not [r for r in rows if r[0] == "delete" and r[1] == 5000]


def test_dv_merge_idempotent_redelivery(spark, table):
    upd = spark.createDataFrame([(7, -9)], ["id", "bucket"])
    v1 = txlog.merge(
        spark, table, upd, ("id",), app_id="cdc", txn_version=1, mode="dv"
    )
    v2 = txlog.merge(
        spark, table, upd, ("id",), app_id="cdc", txn_version=1, mode="dv"
    )
    assert v1 == 1 and v2 == 1  # redelivery is a committed no-op
    got = txlog.read_table(spark, table)
    assert got.count() == 1000
    assert got.where("id = 7").first()["bucket"] == -9


def test_dv_merge_then_optimize_materializes(spark, table):
    txlog.merge(
        spark,
        table,
        spark.createDataFrame([(1, -1), (2, -2)], ["id", "bucket"]),
        ("id",),
        mode="dv",
    )
    v = txlog.optimize(spark, table)
    assert txlog.snapshot_info(table, v)["dv"] == {}
    got = txlog.read_table(spark, table)
    assert got.count() == 1000
    assert got.where("id = 1").first()["bucket"] == -1


def test_timestamp_time_travel(spark, table):
    """TIMESTAMP AS OF: read_table(timestamp=...) resolves the newest
    version committed at or before the instant; the boundary is
    inclusive."""
    txlog.delete_where(spark, table, "bucket = 3", mode="dv")  # v1
    ts0 = txlog._read_manifest(table, 0)["ts"]
    ts1 = txlog._read_manifest(table, 1)["ts"]
    assert txlog.version_at_timestamp(table, ts0) == 0
    assert txlog.version_at_timestamp(table, ts1) == 1
    assert txlog.version_at_timestamp(table, (ts0 + ts1) / 2) == 0
    assert txlog.read_table(spark, table, timestamp=ts0).count() == 1000
    assert txlog.read_table(spark, table, timestamp=ts1 + 5).count() == 900
    with pytest.raises(ValueError, match="predates"):
        txlog.version_at_timestamp(table, ts0 - 1)
    with pytest.raises(ValueError, match="not both"):
        txlog.read_table(spark, table, version=0, timestamp=ts0)


def test_dv_commit_on_checkpoint_version(spark, tmp_path):
    """A dv delete whose version lands exactly on the checkpoint
    cadence writes a FULL manifest: the complete dv map must survive
    the checkpoint (snapshot resolution starts from it) and the feed
    must still derive the position diff."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 100).select("id", (F.col("id") % 10).alias("bucket")),
        checkpoint_every=2,
    )
    txlog.append(
        spark, root, spark.range(100, 200).select("id", (F.col("id") % 10).alias("bucket"))
    )  # v1
    v = txlog.delete_where(spark, root, "bucket = 3", mode="dv")  # v2 = ckpt
    m = txlog._read_manifest(root, v)
    assert txlog._is_full(m) and m.get("checkpoint") is True
    assert m.get("dv"), "checkpoint manifest must snapshot the dv map"
    assert txlog.read_table(spark, root).count() == 180
    assert txlog.row_count(root) == 180
    # another dv delete at v3 (delta) unions with the checkpointed one
    txlog.delete_where(spark, root, "bucket = 7", mode="dv")
    assert txlog.read_table(spark, root).count() == 160
    cdf = txlog.read_changes(spark, root, from_version=1)
    rows = {r["_commit_version"]: r["n"] for r in
            cdf.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()}
    assert rows == {2: 20, 3: 20}


def test_concurrent_dv_deletes_serialize(spark, table):
    """Two dv deletes racing the same commit slot: the loser re-probes
    against the winner's snapshot, so both predicates land and the
    vectors UNION — no lost deletes, no resurrection (the optimistic
    protocol's serializability, now for metadata-only commits)."""
    import threading

    errs: list[Exception] = []

    def dv_del(pred: str) -> None:
        try:
            txlog.delete_where(spark, table, pred, mode="dv")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=dv_del, args=("bucket = 3",))
    t2 = threading.Thread(target=dv_del, args=("bucket = 7",))
    t1.start(), t2.start()
    t1.join(), t2.join()
    assert not errs
    assert txlog.current_version(table) == 2
    got = txlog.read_table(spark, table)
    assert got.count() == 800
    assert got.where("bucket IN (3, 7)").count() == 0
    assert txlog.row_count(table) == 800
    # the change feed attributes each commit its own predicate's rows
    cdf = txlog.read_changes(spark, table, from_version=0)
    assert cdf.count() == 200
    assert cdf.where("_change_type <> 'delete'").count() == 0


def test_concurrent_updates_serialize(spark, table):
    """Two UPDATEs racing the same commit slot — one cow, one dv, on
    DISJOINT predicates: the loser re-probes and re-stages against
    the winner's snapshot, so both transformations land exactly once
    (the delete-race guarantee extended to the round-14 verb, across
    both execution modes at once)."""
    import threading

    errs: list[Exception] = []

    def upd(pred: str, set_expr: str, mode: str) -> None:
        try:
            txlog.update_where(
                spark, table, {"bucket": set_expr}, pred, mode=mode
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(
        target=upd, args=("bucket = 3", "bucket + 100", "cow")
    )
    t2 = threading.Thread(
        target=upd, args=("bucket = 7", "bucket + 200", "dv")
    )
    t1.start(), t2.start()
    t1.join(), t2.join()
    assert not errs
    assert txlog.current_version(table) == 2
    got = txlog.read_table(spark, table)
    assert got.count() == 1000  # updates never change cardinality
    assert got.where("bucket = 103").count() == 100
    assert got.where("bucket = 207").count() == 100
    assert got.where("bucket IN (3, 7)").count() == 0
    # each updated row surfaces in the feed as its delete+insert pair
    cdf = txlog.read_changes(spark, table, from_version=0)
    assert cdf.where("_change_type = 'delete'").count() == 200
    assert cdf.where("_change_type = 'insert'").count() == 200
