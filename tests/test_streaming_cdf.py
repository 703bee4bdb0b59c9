"""Streaming change-data-feed source (streaming/cdf.py): checkpointed
version cursor, availableNow-style drain, crash-redelivery with an
idempotent txlog sink = exactly-once, and resume from a fresh
'process'."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog
from map_reduce_rpc_spark.streaming.cdf import (
    ChangeFeedReader,
    process_available,
)


@pytest.fixture()
def source(spark, tmp_path):
    root = str(tmp_path / "src")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 100).select(F.col("id"), F.lit(0).alias("batch")),
    )
    for b in (1, 2, 3):
        txlog.append(
            spark,
            root,
            spark.range(100 * b, 100 * b + 100).select(
                F.col("id"), F.lit(b).alias("batch")
            ),
        )
    return root


def test_drain_and_incremental_catchup(spark, source, tmp_path):
    """First drain consumes the full history in one batch; later
    commits are picked up incrementally (O(delta)); caught-up polls
    return None."""
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple[int, int]] = []

    def collect(changes, bid):
        seen.append((bid, changes.count()))

    n = process_available(spark, source, ckpt, collect)
    assert n == 1
    assert seen == [(3, 400)]
    assert ChangeFeedReader(source, ckpt).poll(spark) is None
    # two more commits: only the delta is delivered
    txlog.append(
        spark,
        source,
        spark.range(400, 410).select(F.col("id"), F.lit(4).alias("batch")),
    )
    txlog.delete_where(spark, source, "batch = 0")
    n = process_available(spark, source, ckpt, collect)
    assert n == 1
    assert seen[-1] == (5, 110)  # 10 inserts + 100 deletes


def test_bounded_batches_advance_cursor_stepwise(spark, source, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    bids: list[int] = []
    n = process_available(
        spark, source, ckpt, lambda df, b: bids.append(b),
        max_commits_per_batch=1,
    )
    assert n == 4 and bids == [0, 1, 2, 3]
    assert ChangeFeedReader(source, ckpt).cursor() == 3


def test_exactly_once_across_crash_redelivery(spark, source, tmp_path):
    """The foreachBatch contract: a crash AFTER the sink commit but
    BEFORE the cursor write redelivers the same batch id on restart;
    the idempotent (app_id, txn_version=batch_id) txlog sink drops it
    — the derived table ends exactly-once, certified by equality with
    a direct full read."""
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "tgt")
    txlog.create_table(
        spark, target, txlog.read_table(spark, source).limit(0)
    )

    def sink(changes, bid):
        ins = changes.where("_change_type = 'insert'").drop(
            "_change_type", "_commit_version"
        )
        txlog.append(spark, target, ins, app_id="cdf", txn_version=bid)

    def crashing_sink(changes, bid):
        sink(changes, bid)
        raise RuntimeError("crash after sink, before cursor commit")

    with pytest.raises(RuntimeError, match="crash after sink"):
        process_available(
            spark, source, ckpt, crashing_sink, max_commits_per_batch=2
        )
    # cursor never advanced; the 'restarted process' redelivers the
    # SAME range with the same batch id -> sink no-ops, then continues
    assert ChangeFeedReader(source, ckpt).cursor() == -1
    n = process_available(
        spark, source, ckpt, sink, max_commits_per_batch=2
    )
    assert n == 2
    got = txlog.read_table(spark, target)
    src = txlog.read_table(spark, source)
    assert got.count() == 400  # no duplicates from the redelivery
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0


def test_resume_from_fresh_reader_and_offset_atomicity(
    spark, source, tmp_path
):
    ckpt = str(tmp_path / "ckpt")
    r1 = ChangeFeedReader(source, ckpt)
    changes, frm, to = r1.poll(spark, max_commits=2)
    assert (frm, to) == (-1, 1)
    assert changes.count() == 200
    r1.commit(to)
    # a brand-new reader (fresh process) resumes at the stored cursor
    r2 = ChangeFeedReader(source, ckpt)
    assert r2.cursor() == 1
    changes, frm, to = r2.poll(spark)
    assert (frm, to) == (1, 3)
    r2.commit(3)
    assert r2.poll(spark) is None
    with pytest.raises(ValueError, match="regression"):
        r2.commit(1)


def test_full_incremental_loop_partitioned(spark, tmp_path):
    """The closing of the 100 TB incremental loop, end to end:
    micro-batches land EXACTLY-ONCE in a hive-PARTITIONED bronze
    txlog (idempotent (app_id, batch_id) commits, every batch
    deliberately delivered twice); a PARTITION-FILTERED change-feed
    consumer drains bronze one commit per batch through a durable
    cursor into a silver txlog (its own idempotence keys); silver
    ends equal to the bronze partition's content — and a crash+resume
    in the middle of the silver drain changes nothing."""
    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    src = spark.range(0, 400).select(
        F.col("id"), (F.col("id") % 4).alias("bucket")
    )
    txlog.create_table(
        spark, bronze, src.limit(0), partition_by=("bucket",)
    )
    # 4 micro-batches, each delivered TWICE (at-least-once upstream)
    for b in range(4):
        batch = src.where(f"id >= {b * 100} AND id < {(b + 1) * 100}")
        txlog.append(spark, bronze, batch, app_id="ingest", txn_version=b)
        txlog.append(spark, bronze, batch, app_id="ingest", txn_version=b)
    assert txlog.read_table(spark, bronze).count() == 400
    assert txlog.current_version(bronze) == 4  # create + 4 (dups dropped)

    txlog.create_table(
        spark, silver, txlog.read_table(spark, bronze).limit(0)
    )

    def sink(changes, bid):
        ins = changes.where("_change_type = 'insert'").drop(
            "_change_type", "_commit_version"
        )
        txlog.append(spark, silver, ins, app_id="cdf", txn_version=bid)

    reader = ChangeFeedReader(bronze, ckpt)
    # drain two commits, then 'crash' after the sink but before the
    # cursor write; the restart redelivers the same batch id
    got = reader.poll(spark, max_commits=2)
    changes, _frm, to = got
    sink(
        changes.where("bucket = 2"), to
    )
    # crash here: no reader.commit(to)
    n = 0

    def filtered_sink(changes, bid):
        sink(changes.where("bucket = 2"), bid)

    n = process_available(
        spark, bronze, ckpt, filtered_sink, max_commits_per_batch=2
    )
    # v0..v4 in 2-commit ranges = 3 batches, the FIRST being the
    # crash-redelivered (-1,1] with the same batch id -> sink no-ops
    assert n == 3
    silver_rows = txlog.read_table(spark, silver)
    bronze_p2 = txlog.read_table(spark, bronze, partitions={"bucket": 2})
    assert silver_rows.count() == 100  # no dups from the crash replay
    assert silver_rows.exceptAll(bronze_p2).count() == 0
    assert bronze_p2.exceptAll(silver_rows).count() == 0
    # the partition-filtered feed form delivers the same rows with
    # planning-time pruning (inputFiles stay inside bucket=2)
    feed = txlog.read_changes(spark, bronze, -1, partitions={"bucket": 2})
    assert feed.count() == 100
    assert all("/bucket=2/" in f for f in feed.inputFiles())
