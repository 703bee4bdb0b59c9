"""Transactional-table (sources/txlog.py) contracts: atomic commits,
snapshot isolation + time travel, file-level delete, optimistic
concurrency under a real commit race, crash garbage invisibility,
and vacuum safety."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tx")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    txlog.create_table(spark, root, df.repartition(4))
    return root


def test_create_read_append_time_travel(spark, table):
    assert txlog.current_version(table) == 0
    assert txlog.read_table(spark, table).count() == 1000

    more = spark.range(1000, 1250).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    v = txlog.append(spark, table, more)
    assert v == 1
    assert txlog.read_table(spark, table).count() == 1250
    # time travel: v0 is still exactly v0
    assert txlog.read_table(spark, table, version=0).count() == 1000


def test_delete_rewrites_only_victim_files(spark, table):
    # victims live in bucket 3 only; with 4 input partitions each file
    # holds several buckets, so SOME files carry over untouched once
    # we append a victim-free file first
    clean = spark.range(5000, 5100).select(
        F.col("id"), F.lit(99).alias("bucket")
    )
    txlog.append(spark, table, clean.coalesce(1))
    before = set(
        json.load(open(txlog._manifest_path(table, 1)))["files"]
    )
    v = txlog.delete_where(spark, table, "bucket = 3")
    m = json.load(open(txlog._manifest_path(table, v)))
    after = set(m["files"])
    # the clean appended file is carried by NAME, not rewritten
    carried = before & after
    assert carried, "no file carried over — delete rewrote everything"
    assert m["carried"] >= 1 and m["rewrote"] >= 1
    got = txlog.read_table(spark, table)
    assert got.where("bucket = 3").count() == 0
    assert got.count() == 1000 - 100 + 100  # 100 victims out, 100 clean in
    # time travel still sees the victims at the old version
    assert (
        txlog.read_table(spark, table, version=1).where("bucket = 3").count()
        == 100
    )


def test_concurrent_appends_both_survive(spark, table):
    """Two writers race the same parent version: exclusive-create lets
    exactly one claim each version; the loser retries on top. Both
    payloads must land, in two distinct versions."""
    errs: list[Exception] = []

    def add(lo: int) -> None:
        try:
            df = spark.range(lo, lo + 500).select(
                F.col("id"), F.lit(-1).alias("bucket")
            )
            txlog.append(spark, table, df)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=add, args=(10_000,))
    t2 = threading.Thread(target=add, args=(20_000,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    assert txlog.current_version(table) == 2
    got = txlog.read_table(spark, table)
    assert got.where("id >= 10000 and id < 10500").count() == 500
    assert got.where("id >= 20000 and id < 20500").count() == 500
    assert got.count() == 2000


def test_crash_garbage_is_invisible_and_vacuumable(spark, table):
    """Files staged by a writer that died before its commit point must
    never be read, and vacuum removes them."""
    # simulate the crash: stage files, then 'die' (no manifest)
    orphan = spark.range(0, 10).select(
        F.col("id"), F.lit(7).alias("bucket")
    )
    txlog._stage_files(spark, table, orphan)
    assert txlog.read_table(spark, table).count() == 1000  # unchanged
    removed = txlog.vacuum(table)
    assert removed, "vacuum found nothing to remove"
    assert txlog.read_table(spark, table).count() == 1000


def test_vacuum_respects_retained_versions(spark, table):
    txlog.append(
        spark,
        table,
        spark.range(9000, 9010).select(
            F.col("id"), F.lit(0).alias("bucket")
        ),
    )
    txlog.delete_where(spark, table, "id >= 9000")
    # retain current + previous: both must stay readable
    txlog.vacuum(table, retain_versions=2)
    assert txlog.read_table(spark, table).count() == 1000
    assert txlog.read_table(spark, table, version=1).count() == 1010


def test_fully_deleted_table_reads_typed_empty(spark, tmp_path):
    root = str(tmp_path / "tx2")
    txlog.create_table(
        spark, root, spark.range(0, 5).select(F.col("id"))
    )
    txlog.delete_where(spark, root, "id >= 0")
    got = txlog.read_table(spark, root)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == ["id"]


def test_append_enforces_schema(spark, table):
    """Write-side schema contract: int literals are cast to the
    table's long columns (no mixed parquet physical types across
    files), and a wrong column set is a loud error, never silent
    evolution."""
    txlog.append(
        spark,
        table,
        spark.range(7000, 7003).select(
            F.col("id"), F.lit(1).alias("bucket")  # int literal -> cast long
        ),
    )
    got = txlog.read_table(spark, table)
    assert dict(got.dtypes)["bucket"] == "bigint"
    assert got.count() == 1003
    with pytest.raises(ValueError, match="schema mismatch"):
        txlog.append(
            spark, table, spark.range(3).select(F.col("id"))  # missing col
        )


def test_idempotent_txn_append(spark, table):
    """The Delta txnAppId pattern: a redelivered (app_id, txn_version)
    append is a no-op; a NEWER txn_version for the same app commits;
    versions from different apps don't interfere."""
    df = spark.range(0, 10).select(F.col("id"), F.lit(1).alias("bucket"))
    v1 = txlog.append(spark, table, df, app_id="etl", txn_version=0)
    v_dup = txlog.append(spark, table, df, app_id="etl", txn_version=0)
    assert v_dup == v1  # duplicate delivery: no new version
    assert txlog.read_table(spark, table).count() == 1010
    v2 = txlog.append(spark, table, df, app_id="etl", txn_version=1)
    assert v2 == v1 + 1
    v3 = txlog.append(spark, table, df, app_id="other", txn_version=0)
    assert v3 == v2 + 1  # a different app's version space
    assert txlog.read_table(spark, table).count() == 1030
    # idempotence survives an interleaved delete (txn map carried)
    txlog.delete_where(spark, table, "bucket = 1")
    v_dup2 = txlog.append(spark, table, df, app_id="etl", txn_version=1)
    assert v_dup2 == txlog.current_version(table)
    assert txlog.read_table(spark, table).where("bucket = 1").count() == 0
