"""Streaming queries vs batch DuckDB oracles (stream/batch parity)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tests.oracle import assert_matches

STREAM_KEYS = [
    "stream_hourly_counts",
    "stream_session_stats",
    "stream_stateful_sessions",
    "stream_sliding_counts",
    "stream_static_hourly",
    "stream_dedup_events",
    "stream_purchase_click_join",
    "stream_click_attribution",
]


@pytest.mark.parametrize("name", STREAM_KEYS)
def test_stream_matches_batch_oracle(spark, duck, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_matches(q(spark, sf_dir), duck.sql(sql))


def test_stream_and_stateful_sessionizers_agree(spark, sf_dir):
    """Built-in session_window and the applyInPandasWithState
    sessionizer must produce identical (user, start, n, cents) rows."""
    q = entry_mod.queries()
    sw = q["stream_session_stats"](spark, sf_dir).select(
        "user_id", "session_start_us", "n_events", "value_cents"
    )
    st = q["stream_stateful_sessions"](spark, sf_dir).select(
        "user_id", "session_start_us", "n_events", "value_cents"
    )
    assert sw.exceptAll(st).count() == 0
    assert st.exceptAll(sw).count() == 0


def test_checkpoint_resume_exactly_once(spark, sf_dir, tmp_path):
    """File-sink streaming with a checkpoint: new files arriving after
    a restart are processed exactly once — previously committed chunks
    are not reprocessed, nothing is lost. This is the durable-sink
    twin of the memory-sink queries (and the property the reference's
    at-least-once re-execution only approximates)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from map_reduce_rpc_spark.streaming import core
    from map_reduce_rpc_spark.tables import load_table

    pdf = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("event_id").cast("long"),
            F.unix_micros("ts").alias("ts_us"),
            F.col("user_id").cast("long"),
            "event_type",
            F.col("value").cast("double"),
            "props",
        )
        .toPandas()
    )
    half = len(pdf) // 2
    indir = tmp_path / "in"
    outdir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    indir.mkdir()

    def run_once():
        sdf = spark.readStream.schema(core.STREAM_SCHEMA_DDL).parquet(str(indir))
        q = (
            sdf.writeStream.format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    pq.write_table(pa.Table.from_pandas(pdf.iloc[:half], preserve_index=False),
                   str(indir / "chunk0.parquet"))
    run_once()
    n1 = spark.read.parquet(outdir).count()
    assert n1 == half

    pq.write_table(pa.Table.from_pandas(pdf.iloc[half:], preserve_index=False),
                   str(indir / "chunk1.parquet"))
    run_once()
    out = spark.read.parquet(outdir)
    assert out.count() == len(pdf)  # chunk0 NOT reprocessed, chunk1 not lost
    assert out.select("event_id").distinct().count() == len(pdf)
