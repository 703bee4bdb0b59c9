"""Slowly-changing-dimension type 2 (SCD2) maintenance — the CDC
counterpart of the exact/near-dup MERGE manifests: a dimension's
attribute history as (key, attr, effective_from, effective_to,
is_current) rows, maintainable INCREMENTALLY batch by batch.

The core identity making the incremental path certifiable: an SCD2
history that records only actual changes is a bijection of its
collapsed change log — every run's (effective_from, seq) is the
change that opened it. So applying a new change batch reduces to:
re-expand the affected keys' history into pseudo-changes, union the
new changes, collapse again, and MERGE the rewritten keys back
(``sources/sinks.merge_upsert_parquet`` keyed on the dimension key
replaces exactly the affected keys' rows). Unaffected keys are never
read beyond the anti-join — at 100 TB the per-batch cost is
O(batch + history-of-touched-keys), not O(history).

Ordering contract: changes are totally ordered per key by
``(ts, seq)`` (seq breaks same-timestamp ties deterministically), and
batches must arrive in non-decreasing ``ts`` order per key — late
data older than an already-applied change would need a history
rewrite upstream (same contract as any watermark-bounded CDC apply).

No reference analog (single-shot wordcount engine); this serves the
dimension-table side every 100 TB fact pipeline joins against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_collapse(
    changes: DataFrame,
    key: str,
    attr: str,
    ts: str,
    seq: str,
) -> DataFrame:
    """Collapse a change log into SCD2 history: per key, order by
    (ts, seq), drop rows whose ``attr`` equals the previous row's
    (no-op changes), then each surviving row opens a run whose
    ``effective_to`` is the next run's ``effective_from`` (NULL for
    the current run). One shuffle on ``key``; both windows share the
    same partitioning, so Catalyst plans a single Exchange.

    Output: (key, attr, effective_from, effective_seq, effective_to,
    is_current). ``effective_seq`` is retained because it is the run's
    identity under same-timestamp ties AND what makes the history
    re-expandable into pseudo-changes (see scd2_merge_batch).
    """
    w = Window.partitionBy(key).orderBy(ts, seq)
    runs = (
        changes.withColumn("_prev", F.lag(attr).over(w))
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .drop("_prev")
    )
    return (
        runs.withColumn("_to", F.lead(ts).over(w))
        .select(
            F.col(key),
            F.col(attr),
            F.col(ts).alias("effective_from"),
            F.col(seq).alias("effective_seq"),
            F.col("_to").alias("effective_to"),
            F.col("_to").isNull().alias("is_current"),
        )
    )


def scd2_merge_batch(
    spark,
    path: str,
    changes: DataFrame,
    key: str,
    attr: str,
    ts: str,
    seq: str,
    partitions: int | None = None,
) -> None:
    """Apply one change batch to the SCD2 parquet table at ``path``
    (created on first use). Affected keys' history is re-expanded into
    pseudo-changes (one per run, at its opening (from, seq)), unioned
    with the batch, re-collapsed, and MERGEd back keyed on ``key`` —
    so a batch whose first change matches a key's current attr extends
    the open run (original effective_from kept), and anything else
    closes it with effective_to = the new run's start. Idempotent:
    re-applying the same batch rewrites the same rows to the same
    values (the merge sink's exactly-once story).

    With ``partitions`` = N, the table is hash-bucket partitioned on
    ``pmod(xxhash64(key), N)`` (column ``_kb``) and the merge's
    dynamic partition overwrite rewrites ONLY buckets containing an
    affected key — the lever that keeps a small batch's write cost
    proportional to the batch, not the accumulated history (asserted
    byte-level in tests/test_scd.py). Pick N so history/N fits one
    rewrite task; pass the SAME N on every apply.
    """
    import os

    from ..sources.sinks import merge_upsert_parquet

    batch = changes.select(F.col(key), F.col(attr), F.col(ts), F.col(seq))
    exists = os.path.isdir(path) and any(
        not n.startswith(".") for n in os.listdir(path)
    )
    if exists:
        hist = spark.read.parquet(path)
        if partitions is not None:
            # prune the history READ to touched buckets before the
            # semi-join: the bucket list is <= `partitions` small ints
            # (driver-safe collect), and the isin() lands on the _kb
            # partition column, so the scan opens only touched bucket
            # directories — read cost bounded by the batch's spread,
            # like the write side
            buckets = [
                r["kb"]
                for r in batch.select(
                    F.pmod(F.xxhash64(F.col(key)), F.lit(partitions)).alias("kb")
                )
                .distinct()
                .collect()
            ]
            hist = hist.where(F.col("_kb").isin(buckets))
        affected = batch.select(key).distinct()
        prior = (
            hist.join(affected, [key], "left_semi")
            .select(
                F.col(key),
                F.col(attr),
                F.col("effective_from").alias(ts),
                F.col("effective_seq").alias(seq),
            )
        )
        batch = prior.unionByName(batch)
    out = scd2_collapse(batch, key, attr, ts, seq)
    part_cols: tuple[str, ...] = ()
    if partitions is not None:
        out = out.withColumn(
            "_kb", F.pmod(F.xxhash64(F.col(key)), F.lit(partitions))
        )
        part_cols = ("_kb",)
    merge_upsert_parquet(
        spark, path, out, key_cols=(key,), partition_cols=part_cols
    )
