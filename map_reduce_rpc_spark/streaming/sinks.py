"""Streaming sinks beyond the test-only memory sink: the idempotent
``foreachBatch`` materialized view.

The built-in file sink is append-only — correct for immutable event
logs, wrong for a continuously-updated AGGREGATE (e.g. hourly counts
that late data revises). The production pattern without a transactional
table format is:

    windowed aggregate in UPDATE output mode
      -> foreachBatch
      -> dynamic partition overwrite of exactly the partitions this
         micro-batch revised

Idempotence comes from the write being a pure function of the batch
content: re-running a batch after a crash-restart overwrites the same
partitions with the same rows (partitionOverwriteMode=dynamic touches
ONLY partitions present in the batch), so at-least-once batch delivery
yields exactly-once table state. This is the same contract
Delta/Iceberg MERGE gives, degraded gracefully to plain parquet — at
100 TB the partition column (hour/date) bounds each overwrite to the
recently-revised slice, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_overwrite(
    path: str,
    partition_cols: tuple[str, ...],
) -> "callable":
    """Build the ``foreachBatch`` function: dynamic-overwrite the
    output partitions this micro-batch touched. Use with an UPDATE-mode
    aggregate so each batch carries the full revised value of every
    group it contains."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        (
            batch_df.sparkSession.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
        )
        (
            batch_df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )

    return write_batch


def write_materialized_view(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: tuple[str, ...],
):
    """Wire an UPDATE-mode streaming aggregate into the idempotent
    overwrite sink; returns the started query (caller awaits)."""
    return (
        sdf.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(foreach_batch_overwrite(path, partition_cols))
        .trigger(availableNow=True)
        .start()
    )
