"""The ``spark.read.format("txlog")`` Python DataSource (round-12
SQL/catalog surface): a plain-SQL session reaches a txlog table by
format name, and the source honors the full protocol — snapshot
schema binding, column mapping, deletion vectors, hive partition
values, time travel. Parity oracle: the JVM-path txlog.read_table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_rpc_spark.sources import txlog, txlog_source


@pytest.fixture()
def table(spark, tmp_path):
    """A table exercising every protocol feature at once: hive
    partitions, a rename, a dv delete, and a schema evolution."""
    root = str(tmp_path / "tx")
    df = spark.range(0, 200).select(
        "id", (F.col("id") % 4).alias("p"), (F.col("id") * 3).alias("val")
    )
    txlog.create_table(spark, root, df, partition_by=("p",))
    txlog.rename_column(spark, root, "val", "score")
    txlog.delete_where(spark, root, "id < 20", mode="dv")
    txlog.append(
        spark,
        root,
        spark.range(200, 250).select(
            "id",
            (F.col("id") % 4).alias("p"),
            (F.col("id") * 3).alias("score"),
            F.lit("x").alias("tag"),
        ),
        merge_schema=True,
    )
    txlog_source.register(spark)
    return root


def test_sql_read_matches_library_read(spark, table):
    got = spark.read.format("txlog").option("path", table).load()
    got.createOrReplaceTempView("tx_src")
    r = spark.sql(
        "SELECT count(*) AS n, sum(score) AS s, count(tag) AS t FROM tx_src"
    ).first()
    exp = (
        txlog.read_table(spark, table)
        .agg(F.count("*"), F.sum("score"), F.count("tag"))
        .first()
    )
    assert (r["n"], r["s"], r["t"]) == (exp[0], exp[1], exp[2])


def test_partition_column_is_typed_from_path(spark, table):
    got = spark.read.format("txlog").option("path", table).load()
    assert dict(got.dtypes)["p"] == "bigint"
    by_p = {
        r["p"]: r["n"]
        for r in got.groupBy("p").agg(F.count("*").alias("n")).collect()
    }
    exp = {
        r["p"]: r["n"]
        for r in txlog.read_table(spark, table)
        .groupBy("p")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert by_p == exp


def test_time_travel_option(spark, table):
    old = (
        spark.read.format("txlog")
        .option("path", table)
        .option("version", "0")
        .load()
    )
    assert old.columns == ["id", "p", "val"]  # pre-rename, pre-evolution
    assert old.count() == 200  # pre-dv-delete


def test_dv_rows_are_skipped(spark, table):
    got = spark.read.format("txlog").option("path", table).load()
    assert got.where("id < 20").count() == 0
    assert got.count() == 230


def test_evolution_nulls(spark, table):
    got = spark.read.format("txlog").option("path", table).load()
    assert got.where("tag IS NOT NULL").count() == 50
    assert got.where("id < 200 AND tag IS NOT NULL").count() == 0


# ---------------------------------------------------------------------------
# the write path: df.write.format("txlog").mode("append")
# ---------------------------------------------------------------------------


@pytest.fixture()
def plain_table(spark, tmp_path):
    root = str(tmp_path / "wtx")
    txlog.create_table(
        spark,
        root,
        spark.range(0, 100).select("id", (F.col("id") % 10).alias("bucket")),
    )
    txlog_source.register(spark)
    return root


def test_sql_write_appends_through_the_protocol(spark, plain_table):
    (
        spark.range(100, 150)
        .select("id", F.lit(99).alias("bucket"))
        .write.format("txlog")
        .option("path", plain_table)
        .mode("append")
        .save()
    )
    got = txlog.read_table(spark, plain_table)
    assert got.count() == 150
    assert got.where("bucket = 99").count() == 50
    assert txlog.current_version(plain_table) == 1
    assert txlog._read_manifest(plain_table, 1)["writer"] == "datasource"
    assert txlog.row_count(plain_table) == 150  # stats recorded


def test_sql_write_respects_column_mapping(spark, plain_table):
    txlog.rename_column(spark, plain_table, "bucket", "grp")
    (
        spark.range(150, 160)
        .select("id", F.lit(7).alias("grp"))
        .write.format("txlog")
        .option("path", plain_table)
        .mode("append")
        .save()
    )
    got = txlog.read_table(spark, plain_table)
    assert got.count() == 110
    # 10 new rows + the 10 original bucket==7 rows, under the NEW name
    assert got.where("grp = 7").count() == 20


def test_sql_write_guards(spark, plain_table, tmp_path):
    import pyspark.errors

    # incompatible frame: loud, nothing committed
    with pytest.raises(Exception, match="schema mismatch|mismatch"):
        (
            spark.range(5)
            .select("id", F.lit("x").alias("other"))
            .write.format("txlog")
            .option("path", plain_table)
            .mode("append")
            .save()
        )
    assert txlog.current_version(plain_table) == 0
    # overwrite refused
    with pytest.raises(Exception, match="append"):
        (
            spark.range(5)
            .select("id", F.lit(1).alias("bucket"))
            .write.format("txlog")
            .option("path", plain_table)
            .mode("overwrite")
            .save()
        )
    # partitioned tables are the library writer's job
    proot = str(tmp_path / "ptx")
    txlog.create_table(
        spark,
        proot,
        spark.range(10).select("id", (F.col("id") % 2).alias("p")),
        partition_by=("p",),
    )
    with pytest.raises(Exception, match="unpartitioned"):
        (
            spark.range(5)
            .select("id", F.lit(0).alias("p"))
            .write.format("txlog")
            .option("path", proot)
            .mode("append")
            .save()
        )


def test_sql_write_enforces_constraints(spark, plain_table):
    txlog.add_constraint(spark, plain_table, "nonneg", "bucket >= 0")
    with pytest.raises(Exception, match="constraint|CHECK"):
        (
            spark.range(5)
            .select("id", F.lit(-1).alias("bucket"))
            .write.format("txlog")
            .option("path", plain_table)
            .mode("append")
            .save()
        )
    # add_constraint committed v1; the blocked write added nothing
    assert txlog.current_version(plain_table) == 1
    assert txlog.read_table(spark, plain_table).count() == 100


def test_stream_write_exactly_once(spark, tmp_path):
    """writeStream.format("txlog"): a micro-batch commits through the
    (app_id, batchId) idempotence map, so replaying the SAME logical
    stream from a fresh checkpoint (at-least-once redelivery) commits
    nothing and deletes its duplicate files — exactly-once through
    the format name."""
    root = str(tmp_path / "tx")
    src = str(tmp_path / "src")
    txlog.create_table(
        spark, root, spark.range(0, 10).select("id", F.lit(0).alias("b"))
    )
    spark.range(100, 200).select("id", F.lit(1).alias("b")).write.parquet(src)
    txlog_source.register(spark)

    def run(ckpt: str) -> None:
        q = (
            spark.readStream.schema("id long, b int")
            .parquet(src)
            .writeStream.format("txlog")
            .option("path", root)
            .option("app_id", "stream-a")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ck1")
    assert txlog.read_table(spark, root).count() == 110
    assert txlog.current_version(root) == 1
    run("ck2")  # fresh checkpoint, same app_id: batch 0 redelivered
    assert txlog.read_table(spark, root).count() == 110
    assert txlog.current_version(root) == 1
    m = txlog._read_manifest(root, 1)
    assert m["txn"] == {"stream-a": 0} and m["writer"] == "datasource"
    # no orphan duplicate files left behind
    assert txlog.vacuum(root, dry_run=True) == []
