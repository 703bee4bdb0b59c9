"""Column-mapping contracts (round-12 verdict item 4 — ALTER TABLE
RENAME/DROP COLUMN without rewriting data files, the Delta
column-mapping design): logical names live in the manifest, physical
names live in the files forever; rename/drop are metadata-only
commits; a re-added name can never resurrect dropped values; time
travel, CDF, merge, deletion vectors, restore, and clone all stay
exact across the mapping."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "tx")
    df = spark.range(0, 100).select(
        "id", (F.col("id") % 10).alias("bucket"), (F.col("id") * 2).alias("val")
    )
    txlog.create_table(spark, root, df.repartition(2))
    return root


def _inodes(root: str, version: int) -> dict[str, int]:
    return {
        rel: os.stat(os.path.join(root, rel)).st_ino
        for rel in txlog.snapshot_info(root, version)["files"]
    }


def test_rename_touches_no_data_file(spark, table):
    before = _inodes(table, 0)
    v = txlog.rename_column(spark, table, "val", "score")
    assert _inodes(table, v) == before, "rename must be metadata-only"
    got = txlog.read_table(spark, table)
    assert got.columns == ["id", "bucket", "score"]
    assert got.agg(F.sum("score")).first()[0] == sum(i * 2 for i in range(100))
    # time travel below the rename shows (and reads) the OLD name
    old = txlog.read_table(spark, table, version=0)
    assert old.columns == ["id", "bucket", "val"]
    assert old.agg(F.sum("val")).first()[0] == sum(i * 2 for i in range(100))


def test_rename_then_append_mixes_eras_seamlessly(spark, table):
    txlog.rename_column(spark, table, "val", "score")
    txlog.append(
        spark,
        table,
        spark.range(100, 150).select(
            "id", (F.col("id") % 10).alias("bucket"),
            (F.col("id") * 2).alias("score"),
        ),
    )
    got = txlog.read_table(spark, table)
    assert got.count() == 150
    assert got.agg(F.sum("score")).first()[0] == sum(i * 2 for i in range(150))
    # manifest-stats pruning keys stay physical: scan on the NEW name
    sc = txlog.scan_table(spark, table, "score", 0, 50)
    assert sc.count() == 26


def test_drop_then_readd_never_resurrects(spark, table):
    before = _inodes(table, 0)
    v = txlog.drop_column(spark, table, "bucket")
    assert _inodes(table, v) == before, "drop must be metadata-only"
    assert txlog.read_table(spark, table).columns == ["id", "val"]
    txlog.append(
        spark,
        table,
        spark.range(100, 110).select(
            "id", (F.col("id") * 2).alias("val"), F.lit(77).alias("bucket")
        ),
        merge_schema=True,
    )
    got = txlog.read_table(spark, table)
    # old rows: NULL (the dropped physical column's values are dead);
    # new rows: the appended values
    assert got.where("id < 100 AND bucket IS NOT NULL").count() == 0
    assert got.where("bucket = 77").count() == 10
    # time travel below the drop still reads the original values
    v0 = txlog.read_table(spark, table, version=0)
    assert v0.where("bucket IS NOT NULL").count() == 100


def test_rename_guards(spark, table):
    with pytest.raises(ValueError, match="no such column"):
        txlog.rename_column(spark, table, "nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        txlog.rename_column(spark, table, "val", "bucket")
    with pytest.raises(ValueError, match="reserved"):
        txlog.rename_column(spark, table, "val", "#rows")
    with pytest.raises(ValueError, match="only column"):
        root2 = str(table) + "2"
        txlog.create_table(spark, root2, spark.range(3).select("id"))
        txlog.drop_column(spark, root2, "id")


def test_partition_column_cannot_be_renamed_or_dropped(spark, tmp_path):
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(20).select("id", (F.col("id") % 2).alias("p")),
        partition_by=("p",),
    )
    with pytest.raises(ValueError, match="partition column"):
        txlog.rename_column(spark, root, "p", "q")
    with pytest.raises(ValueError, match="partition column"):
        txlog.drop_column(spark, root, "p")


def test_cdf_treats_rename_as_identity(spark, table):
    """Pre-rename commits must surface under the POST-rename name
    (physical identity), never as NULLs; the rename commit itself is
    empty in the feed."""
    txlog.rename_column(spark, table, "val", "score")  # v1
    txlog.delete_where(spark, table, "score < 20")  # v2: ids 0..9
    cdf = txlog.read_changes(spark, table, from_version=0)
    assert "score" in cdf.columns and "val" not in cdf.columns
    assert cdf.where("_commit_version = 1").count() == 0
    dels = cdf.where("_change_type = 'delete'")
    assert dels.count() == 10
    assert dels.where("score IS NULL").count() == 0
    assert dels.agg(F.sum("score")).first()[0] == sum(i * 2 for i in range(10))


def test_restore_rolls_mapping_back(spark, table):
    txlog.rename_column(spark, table, "val", "score")
    txlog.restore(spark, table, 0)
    got = txlog.read_table(spark, table)
    assert got.columns == ["id", "bucket", "val"]
    assert got.count() == 100
    # and forward again: restore to the renamed version
    txlog.restore(spark, table, 1)
    assert txlog.read_table(spark, table).columns == ["id", "bucket", "score"]


def test_mapping_with_deletion_vectors_and_merge(spark, table):
    txlog.rename_column(spark, table, "val", "score")
    txlog.delete_where(spark, table, "score >= 180", mode="dv")  # ids 90+
    got = txlog.read_table(spark, table)
    assert got.count() == 90
    assert txlog.row_count(table) == 90
    txlog.merge(
        spark,
        table,
        spark.createDataFrame([(5, 5, -1), (95, 5, -2)], ["id", "bucket", "score"]),
        ("id",),
    )
    got = txlog.read_table(spark, table)
    assert got.where("id = 5").first()["score"] == -1
    assert got.where("id = 95").first()["score"] == -2  # re-insert of dead key
    assert got.count() == 91
    # optimize materializes through mapping + vectors
    v = txlog.optimize(spark, table)
    assert txlog.snapshot_info(table, v)["dv"] == {}
    assert txlog.read_table(spark, table).count() == 91


def test_clone_carries_mapping(spark, tmp_path, table):
    txlog.rename_column(spark, table, "val", "score")
    dst = str(tmp_path / "clone")
    txlog.clone_table(spark, table, dst)
    got = txlog.read_table(spark, dst)
    assert got.columns == ["id", "bucket", "score"]
    assert got.agg(F.sum("score")).first()[0] == sum(i * 2 for i in range(100))
    # clone evolves independently: rename again on the clone only
    txlog.rename_column(spark, dst, "score", "points")
    assert txlog.read_table(spark, dst).columns == ["id", "bucket", "points"]
    assert txlog.read_table(spark, table).columns == ["id", "bucket", "score"]


def test_checkpoint_carries_mapping(spark, tmp_path):
    """_mapping_at's walk stops at full manifests, so checkpoints must
    re-record an active mapping."""
    root = str(tmp_path / "tx")
    txlog.create_table(
        spark,
        root,
        spark.range(50).select("id", F.col("id").alias("v")),
        checkpoint_every=3,
    )
    txlog.rename_column(spark, root, "v", "w")  # v1
    for i in range(5):  # cross v3 and v6 checkpoints
        txlog.append(
            spark,
            root,
            spark.range(100 + i, 101 + i).select("id", F.col("id").alias("w")),
        )
    got = txlog.read_table(spark, root)
    assert got.columns == ["id", "w"]
    assert got.count() == 55
    assert got.where("w IS NULL").count() == 0
