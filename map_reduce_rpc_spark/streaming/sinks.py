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

CORRECTNESS CONTRACT (the subtle one): UPDATE output mode emits only
the groups a micro-batch CHANGED. Overwriting a partition with just
those groups is lossless ONLY when ``partition_cols`` functionally
determine the aggregate's full grouping key — i.e. one group per
partition (partition col == group key, as in hourly counts keyed by
hour). When the grouping key is finer (e.g. grouped by (hour, user)
but partitioned by hour), an overwrite would drop the partition's
unchanged sibling groups. For that shape pass ``merge_on`` = the full
grouping key: the sink then read-merges each touched partition
(existing rows anti-joined on the key, union, rewrite) so siblings
survive. The merge path costs one read of the touched partitions per
batch — still bounded by the revised slice, never the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_overwrite(
    path: str,
    partition_cols: tuple[str, ...],
    merge_on: tuple[str, ...] | None = None,
) -> "callable":
    """Build the ``foreachBatch`` function: dynamic-overwrite the
    output partitions this micro-batch touched.

    Use with an UPDATE-mode aggregate so each batch carries the full
    revised value of every group it contains. If the aggregate's
    grouping key is finer than ``partition_cols``, pass it as
    ``merge_on`` — see the module docstring for why the plain
    overwrite would otherwise drop unchanged sibling groups.

    ``partition_cols`` must be non-empty: with no partition columns
    every overwrite is STATIC (dynamic mode only scopes deletion to
    partitions), so the write would clear the whole table before the
    survivors scan that reads it — the exact hazard the merge path
    exists to avoid.
    """
    if not partition_cols:
        raise ValueError(
            "foreach_batch_overwrite requires at least one partition "
            "column; an unpartitioned overwrite is static and would "
            "drop every group absent from the current micro-batch"
        )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.columns:
            return
        out = batch_df
        if merge_on is not None:
            spark = batch_df.sparkSession
            try:
                existing = spark.read.parquet(path)
            except Exception:
                existing = None  # first batch: nothing to merge yet
            if existing is not None:
                # Keep only existing rows in TOUCHED partitions whose
                # group key is NOT revised by this batch; the overwrite
                # below replaces those partitions wholesale.
                touched = batch_df.select(*partition_cols).distinct()
                survivors = (
                    existing.join(touched, list(partition_cols), "left_semi")
                    .join(
                        batch_df.select(*merge_on).distinct(),
                        list(merge_on),
                        "left_anti",
                    )
                )
                out = batch_df.unionByName(
                    survivors.select(*batch_df.columns)
                )
                # Materialize the merged batch BEFORE the overwrite so
                # no task reads `path` while the commit is replacing it
                # — same guard (and comment) as the batch twin
                # merge_upsert_parquet in sources/sinks.py.
                out = out.localCheckpoint()
        # partitionOverwriteMode as a PER-WRITE option: scoped to this
        # write, no session-conf leak into later overwrite writes.
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )

    return write_batch


def write_materialized_view(
    sdf: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: tuple[str, ...],
    merge_on: tuple[str, ...] | None = None,
):
    """Wire an UPDATE-mode streaming aggregate into the idempotent
    overwrite sink; returns the started query (caller awaits).

    ``merge_on``: pass the aggregate's full grouping key whenever it is
    finer than ``partition_cols`` (module docstring has the contract).
    """
    return (
        sdf.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            foreach_batch_overwrite(path, partition_cols, merge_on)
        )
        .trigger(availableNow=True)
        .start()
    )
