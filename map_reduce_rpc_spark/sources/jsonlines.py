"""JSON-lines key/value format (reference operators E4/E5).

The reference materializes its shuffle as JSON-lines files
``mr-{mapIdx}-{bucket}``, one ``{"Key":...,"Value":...}`` object per
record (write: ``/root/reference/mr/worker.go:104-120``; read:
``mr/worker.go:42-56``). Spark's own shuffle replaces that wholesale,
but the *format* is still a useful interchange surface — these helpers
make the engine able to emit and ingest it.

Scale notes: the reader takes an explicit schema (no inference scan —
an inference pass over 100 TB is a full extra read); the writer hash-
partitions by key first so each output file holds complete key groups,
mirroring the reference's bucket-contract (``arrangeImmediate``,
mr/worker.go:126-133) without promising its FNV bucket *assignment*
(not observable in any reference test, SURVEY.md §2.1 E3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

KV_JSON_SCHEMA = StructType(
    [
        StructField("Key", StringType(), True),
        StructField("Value", StringType(), True),
    ]
)


def write_kv_jsonl(df: DataFrame, path: str, num_buckets: int = 10, mode: str = "error") -> None:
    """Write a ``(key, value)`` frame as bucketed JSON-lines files.

    ``repartition(n, key)`` = the reference's hash split into nReduce
    buckets (default 10, mr_coordinator.go:17); field names ``Key`` /
    ``Value`` match the Go struct tags so the files interop byte-wise.
    """
    (
        df.select(F.col("key").alias("Key"), F.col("value").alias("Value"))
        .repartition(num_buckets, "Key")
        .write.mode(mode)
        .json(path)
    )


def read_kv_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read JSON-lines KV files back to a ``(key, value)`` frame."""
    return spark.read.schema(KV_JSON_SCHEMA).json(path).select(
        F.col("Key").alias("key"), F.col("Value").alias("value")
    )
