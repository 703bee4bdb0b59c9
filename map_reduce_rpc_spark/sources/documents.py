"""Whole-file text source (reference operator E1).

The reference's only input format: one text file = one record of
``(filename, full_contents)`` handed to the Map UDF
(``/root/reference/mr/worker.go:82-98`` — ``os.Open`` + ``io.ReadAll``;
sequential oracle identical at ``mr_sequential.go:42-53``).

Two readers:

- :func:`read_whole_files` — exact semantic parity (1 file -> 1 row).
  Fine for corpora of moderately sized documents; at 100 TB this is the
  small-files problem *and* the giant-record problem (a 10 GB file
  becomes one row in one task), so use it only when the workload truly
  needs whole-document totality.
- :func:`read_text_lines` — the scale path: ``spark.read.text`` is
  splittable (large files are read by many tasks in parallel) and
  streams; ``input_file_name()`` preserves document identity per line.
  Every reference workload (wordcount, indexer, file metadata) is a
  token-multiset computation, so line granularity is semantically
  equivalent — only tokens spanning a newline differ, and the
  reference's tokenizer splits on newlines anyway (``\\n`` is a
  non-letter rune, plugins/wc.go:24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("text", StringType(), True),
    ]
)


def read_whole_files(spark: SparkSession, path: str, min_partitions: int | None = None) -> DataFrame:
    """One file -> one ``(doc_id, text)`` row; doc_id is the file URI.

    Exact E1 parity (mr/worker.go:90: the whole file in memory as one
    string). ``minPartitions`` caps the small-files penalty by packing
    many files per task (CombineFileInputFormat under the hood).
    """
    rdd = spark.sparkContext.wholeTextFiles(path, minPartitions=min_partitions)
    return spark.createDataFrame(rdd, schema=DOC_SCHEMA)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Scalable variant: ``(doc_id, line)`` rows, splittable scan."""
    return spark.read.text(path).select(
        F.input_file_name().alias("doc_id"),
        F.col("value").alias("line"),
    )


def reassemble_documents(lines: DataFrame) -> DataFrame:
    """Regroup a line-level frame back to ``(doc_id, text)``.

    Line order within a document is NOT guaranteed after a shuffle, so
    this is only for order-insensitive workloads (token multisets — the
    entire reference plugin library, SURVEY.md §2.2). When byte-exact
    reconstruction matters, use :func:`read_whole_files` instead.
    """
    return lines.groupBy("doc_id").agg(
        F.concat_ws("\n", F.collect_list("line")).alias("text")
    )
