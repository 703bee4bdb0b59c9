"""LogStore contracts (round-12): the commit primitive behind the
txlog protocol, on both backends — POSIX hard-link and simulated
object-store conditional PUT. The promise under test: exactly one of
N racing writers wins a path, readers never observe partial bytes,
and the full txlog verb set behaves identically on a store with NO
hard links (tests/test_txlog_model.py runs the state machine on both;
this module pins the primitive itself plus a real multi-writer append
race on the conditional-PUT store)."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog
from map_reduce_rpc_spark.sources.logstore import (
    ConditionalPutLogStore,
    PosixLogStore,
)

STORES = {
    "posix": PosixLogStore,
    "condput": ConditionalPutLogStore,
}


@pytest.fixture(params=sorted(STORES))
def store(request):
    return STORES[request.param]()


def test_put_if_absent_single_winner(store, tmp_path):
    path = str(tmp_path / "log" / "v00000001.json")
    assert store.put_if_absent(path, b'{"w": 1}') is True
    assert store.put_if_absent(path, b'{"w": 2}') is False
    with open(path, "rb") as fh:
        assert fh.read() == b'{"w": 1}'


def test_put_if_absent_threaded_race_one_winner(store, tmp_path):
    path = str(tmp_path / "log" / "v00000007.json")
    wins: list[int] = []
    barrier = threading.Barrier(8)

    def claim(i: int) -> None:
        barrier.wait()
        if store.put_if_absent(path, json.dumps({"w": i}).encode()):
            wins.append(i)

    ts = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1, f"expected exactly one winner, got {wins}"
    with open(path) as fh:
        assert json.load(fh) == {"w": wins[0]}
    # no leaked temp objects
    leftovers = [
        n for n in os.listdir(tmp_path / "log") if n.startswith(".tmp-")
    ]
    assert leftovers == []


def test_link_or_copy_shares_immutable_bytes(store, tmp_path):
    src = tmp_path / "a.parquet"
    src.write_bytes(b"immutable-bytes")
    dst = tmp_path / "b.parquet"
    store.link_or_copy(str(src), str(dst))
    assert dst.read_bytes() == b"immutable-bytes"
    # removing the source never breaks the share (hard link refcount
    # on POSIX, an independent copy elsewhere)
    os.unlink(src)
    assert dst.read_bytes() == b"immutable-bytes"


def test_condput_append_race_serializes(spark, tmp_path):
    """The real thing the abstraction must prove: two writers racing
    txlog.append on the conditional-PUT store (no hard links anywhere
    in the commit path) both land, at distinct versions, losing
    nothing."""
    with txlog.using_log_store(ConditionalPutLogStore()):
        root = str(tmp_path / "tx")
        txlog.create_table(
            spark,
            root,
            spark.range(0, 100).select("id", (F.col("id") % 10).alias("b")),
        )
        errs: list[Exception] = []

        def add(lo: int) -> None:
            try:
                txlog.append(
                    spark,
                    root,
                    spark.range(lo, lo + 50).select(
                        "id", F.lit(99).alias("b")
                    ),
                )
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        t1 = threading.Thread(target=add, args=(10_000,))
        t2 = threading.Thread(target=add, args=(20_000,))
        t1.start(), t2.start()
        t1.join(), t2.join()
        assert not errs
        assert txlog.current_version(root) == 2
        assert txlog.read_table(spark, root).count() == 200


def test_condput_clone_survives_source_vacuum(spark, tmp_path):
    """CLONE on the object-store backend is a real copy (server-side
    CopyObject), so source churn + vacuum must leave it intact —
    the same contract the hard-link clone pins on POSIX."""
    with txlog.using_log_store(ConditionalPutLogStore()):
        src = str(tmp_path / "src")
        dst = str(tmp_path / "clone")
        txlog.create_table(
            spark, src, spark.range(0, 100).select("id")
        )
        txlog.clone_table(spark, src, dst)
        txlog.optimize(spark, src)
        txlog.vacuum(src, retain_versions=1)
        assert txlog.read_table(spark, dst).count() == 100
        assert txlog.read_table(spark, src).count() == 100
