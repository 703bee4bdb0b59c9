"""Reader-feature gating (round-14): manifests record the format
features a reader MUST understand (``required_features``), and every
manifest bind checks them against the build's known set. The hazard
this closes: an older build of this library — or any third-party
reader of the format — silently IGNORES unknown manifest keys, so a
pre-deletion-vector reader skips ``m["dv"]`` and RESURRECTS deleted
rows, and a pre-mapping reader decodes physical column names as
logical ones. The gate turns both into a loud RuntimeError at
snapshot bind. Delta's equivalent: minReaderVersion/readerFeatures.
Reference: N/A (the Go engine has no storage format, SURVEY §2.4).
"""

from __future__ import annotations

import json
import os

import pytest

from map_reduce_rpc_spark.sources import txlog


def _mk(spark, root, partition_by=()):
    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(60)],
        "id long, grp long, val double",
    )
    txlog.create_table(spark, root, df, partition_by=partition_by)
    return df


def _features(root, v):
    return set(
        txlog._read_manifest(root, v).get("required_features", [])
    )


def _strip(monkeypatch, *features):
    monkeypatch.setattr(
        txlog,
        "_KNOWN_READER_FEATURES",
        frozenset(txlog._KNOWN_READER_FEATURES - set(features)),
    )


def test_features_recorded_per_trigger(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    # a plain unpartitioned create requires nothing
    assert _features(root, 0) == set()
    txlog.append(
        spark,
        root,
        spark.createDataFrame([(100, 1, 1.0)], "id long, grp long, val double"),
    )
    assert _features(root, 1) == set()
    # first dv commit starts requiring deletion_vectors...
    v = txlog.delete_where(spark, root, "id = 5", mode="dv")
    assert "deletion_vectors" in _features(root, v)
    # ...and it is STICKY on every later commit, even a plain append
    v2 = txlog.append(
        spark,
        root,
        spark.createDataFrame([(101, 1, 1.0)], "id long, grp long, val double"),
    )
    assert "deletion_vectors" in _features(root, v2)
    # a rename turns on column_mapping
    v3 = txlog.rename_column(spark, root, "val", "amount")
    assert {"deletion_vectors", "column_mapping"} <= _features(root, v3)
    # history binds per manifest: v0 still requires nothing, so an
    # old reader can still time-travel to pre-feature versions
    assert _features(root, 0) == set()


def test_partitioned_create_requires_partitioning(spark, tmp_path):
    root = str(tmp_path / "p")
    _mk(spark, root, partition_by=("grp",))
    assert "partitioning" in _features(root, 0)


def test_unknown_feature_raises_not_resurrects(spark, tmp_path, monkeypatch):
    """THE gating scenario: a reader build without deletion-vector
    support must FAIL LOUDLY on a dv-carrying snapshot — reading
    anyway would resurrect the deleted rows."""
    root = str(tmp_path / "dv")
    _mk(spark, root)
    v = txlog.delete_where(spark, root, "id < 10", mode="dv")
    assert txlog.read_table(spark, root).count() == 50
    _strip(monkeypatch, "deletion_vectors")
    with pytest.raises(RuntimeError, match="deletion_vectors"):
        txlog.read_table(spark, root, version=v).count()
    # the same downgraded reader still reads the PRE-dv version
    assert txlog.read_table(spark, root, version=0).count() == 60


def test_unknown_feature_blocks_every_bind_path(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "paths")
    _mk(spark, root)
    txlog.rename_column(spark, root, "val", "amount")
    _strip(monkeypatch, "column_mapping")
    with pytest.raises(RuntimeError, match="column_mapping"):
        txlog.read_table(spark, root)
    with pytest.raises(RuntimeError, match="column_mapping"):
        txlog.snapshot_info(root, txlog.current_version(root))
    with pytest.raises(RuntimeError, match="column_mapping"):
        txlog.read_changes(spark, root, 0).count()
    # the DataSource bind path (spark.read.format("txlog")) routes
    # through the same txlog._read_manifest choke point — but its
    # planning runs in a separate Python worker process, so a
    # driver-side monkeypatch of the known set cannot reach it to
    # demonstrate the raise here; the shared choke point is the
    # guarantee (txlog_source._resolve -> _schema_json_at/_mapping_at
    # -> _manifest_meta, all gated above)


def test_future_feature_from_other_writer_raises(spark, tmp_path):
    """A manifest written by a NEWER library with a feature this build
    has never heard of — hand-forged, since we cannot run the future
    build — must refuse to bind."""
    root = str(tmp_path / "future")
    _mk(spark, root)
    v = txlog.current_version(root)
    p = txlog._manifest_path(root, v)
    m = json.loads(open(p).read())
    m["required_features"] = ["quantum_row_ids"]
    # manifests are immutable in the protocol; simulate the other
    # writer by replacing the file (tests may do what readers cannot)
    os.remove(p)
    with open(p, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(RuntimeError, match="quantum_row_ids"):
        txlog.read_table(spark, root).count()


def test_clone_and_restore_carry_features(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "src")
    clone = str(tmp_path / "dst")
    _mk(spark, root, partition_by=("grp",))
    txlog.delete_where(spark, root, "id = 7", mode="dv")
    txlog.clone_table(spark, root, clone)
    got = _features(clone, 0)
    assert {"partitioning", "deletion_vectors"} <= got
    # restore to the pre-dv version: STICKY — the restored tip still
    # requires deletion_vectors (the history behind it does), exactly
    # Delta's monotone readerFeatures
    v = txlog.restore(spark, root, 0)
    assert "deletion_vectors" in _features(root, v)
    # and a downgraded reader refuses the clone as loudly as the source
    _strip(monkeypatch, "deletion_vectors")
    with pytest.raises(RuntimeError, match="deletion_vectors"):
        txlog.read_table(spark, clone).count()


def test_update_where_dv_requires_deletion_vectors(spark, tmp_path):
    root = str(tmp_path / "upd")
    _mk(spark, root)
    v = txlog.update_where(
        spark, root, {"val": "val + 1"}, "id < 5", mode="dv"
    )
    assert "deletion_vectors" in _features(root, v)
    # cow update rewrites files — no new reader capability needed
    root2 = str(tmp_path / "updcow")
    _mk(spark, root2)
    v2 = txlog.update_where(spark, root2, {"val": "val + 1"}, "id < 5")
    assert _features(root2, v2) == set()
