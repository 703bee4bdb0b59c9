"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Engine code lives in ``map_reduce_rpc_spark/``; this module only wires
the query library to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from map_reduce_rpc_spark.plans import parity

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: wordcount over the documents corpus.

    Exercises the reference's whole engine path (scan -> flatMap
    tokenize -> shuffle -> agg -> sink), SURVEY.md §7 phase 0.
    """
    return parity.wordcount(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # —— reference parity (SURVEY.md §2.2) ——
        "wordcount": parity.wordcount,
        "inverted_index": parity.inverted_index,
        "file_counts": parity.file_counts,
        "file_meta_concat": parity.file_meta_concat,
        "kv_pipeline": parity.kv_pipeline,
    }
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query (ANSI, runs on the registered
    views region nation customer supplier part orders lineitem events
    documents embeddings)."""
    o: dict[str, str] = {}
    o.update(parity.PARITY_ORACLES)
    return o
