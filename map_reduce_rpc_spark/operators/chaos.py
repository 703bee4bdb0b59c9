"""Fault-tolerance parity: the reference's crash test, Spark-style.

Reference: ``plugins/crash.go:23-35`` (``maybeCrash``: 33% hard exit,
33% up-to-10s stall) driven by ``test-mr.sh:287-333`` — workers are
killed and respawned mid-job and the final output must still byte-match
the no-crash oracle. The engine property under test is *deterministic
results under at-least-once re-execution* (SURVEY.md §2.3).

Spark's equivalent machinery is lineage re-execution + task retries
(``spark.task.maxFailures``). We inject failures with the standard
attempt-number trick: a pass-through ``mapInPandas`` stage raises on
every task's FIRST attempt in selected partitions, so the scheduler
must retry; the retried attempt succeeds and the job's result must be
identical to a clean run.

Run as a script (needs its own SparkContext — ``local[N, F]`` sets
task retries in local mode, the test session's ``local[N]`` would die
on first failure):

    python -m map_reduce_rpc_spark.operators.chaos
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame


def flaky_passthrough(df: DataFrame, fail_partitions: frozenset[int] = frozenset({0, 1})) -> DataFrame:
    """Identity stage that fails each selected partition's first task
    attempt. Downstream results must be unaffected (retries replay the
    partition from lineage; pure UDFs make that safe — the same
    determinism contract the reference's crash test enforces)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        if tc is not None and tc.partitionId() in fail_partitions and tc.attemptNumber() == 0:
            raise RuntimeError(
                f"injected chaos failure (partition {tc.partitionId()}, attempt 0)"
            )
        yield from batches

    return df.mapInPandas(gen, df.schema)


def _main() -> None:
    import os

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.master("local[8, 4]")  # 4 task attempts
        .appName("chaos_check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # jobcount-test parity (test-mr.sh:216-224): no duplicate execution
    # under no-failure requires speculation off — Spark's default.
    assert spark.conf.get("spark.speculation", "false") == "false"

    from ..plans.parity import wordcount
    from ..tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    flaky = flaky_passthrough(docs)

    from ..functions.text import tokens

    chaotic = (
        flaky.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    clean = wordcount(spark, sf_dir)

    diff = chaotic.exceptAll(clean).count() + clean.exceptAll(chaotic).count()
    assert diff == 0, f"chaos run diverged from clean run by {diff} rows"

    # Round 5: the grouped union-find closure (applyInPandas,
    # semantic-dedup's single-shuffle CC) must also be deterministic
    # under first-attempt task failures — a retried group replays its
    # whole Arrow batch, and the union-find is a pure function of it.
    from .graph import components_within_blocks

    edges = docs.select(
        (F.col("doc_id") / 100).cast("long").alias("blk"),
        F.col("doc_id").cast("long").alias("id_a"),
        (F.col("doc_id") + 1).cast("long").alias("id_b"),
    ).where(F.col("doc_id") % 100 != 99)  # keep edges block-local
    cc_chaotic = components_within_blocks(flaky_passthrough(edges), "blk")
    cc_clean = components_within_blocks(edges, "blk")
    cc_diff = (
        cc_chaotic.exceptAll(cc_clean).count()
        + cc_clean.exceptAll(cc_chaotic).count()
    )
    assert cc_diff == 0, f"union-find chaos run diverged by {cc_diff} rows"

    print(f"CHAOS OK rows={clean.count()} cc_rows={cc_clean.count()} diff=0")
    spark.stop()


if __name__ == "__main__":
    _main()
