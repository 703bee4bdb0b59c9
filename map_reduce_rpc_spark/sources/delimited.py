"""Generic delimited / JSON line sources with malformed-record policy.

The reference reads only whole text files (``/root/reference/mr/worker.go``
scan loop); a production corpus also arrives as CSV/TSV and JSON lines.
These readers wrap the built-in sources with the settings that matter
at 100 TB:

- **Explicit schema, always.** Schema inference is a full extra pass
  over the data (and nondeterministic under sampling); at scale it is
  both a 2x cost and a correctness hazard. Callers pass DDL strings.
- **Malformed-record policy is a parameter**, not an afterthought:
  ``PERMISSIVE`` (default) quarantines bad rows into
  ``_corrupt_record`` so a single mangled line in a 100 TB drop cannot
  kill the job, while the quarantine column makes the bad rows
  *queryable* (count them, sample them, route them to a dead-letter
  sink). ``DROPMALFORMED`` / ``FAILFAST`` for when silence or loudness
  is wanted instead.
- Both sources are splittable line formats — unlike whole-file text,
  Spark assigns byte ranges of large files to tasks, so partition
  count tracks bytes, not file count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_col(schema_ddl: str, mode: str) -> str:
    if mode.upper() == "PERMISSIVE" and CORRUPT_COL not in schema_ddl:
        return f"{schema_ddl}, {CORRUPT_COL} string"
    return schema_ddl


def read_csv(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    mode: str = "PERMISSIVE",
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV/TSV reader: explicit schema, quarantined malformed rows."""
    return (
        spark.read.schema(_with_corrupt_col(schema_ddl, mode))
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """JSON-lines reader: explicit schema, quarantined malformed rows."""
    return (
        spark.read.schema(_with_corrupt_col(schema_ddl, mode))
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_corrupt_col, bad_rows_raw_text).

    The standard dead-letter split: good rows continue down the
    pipeline with the clean schema; bad rows keep only the raw line
    for repair/audit.

    Spark refuses queries that reference only the internal corrupt
    column of an uncached CSV/JSON scan (the parser would prune away
    the very fields whose parse failure defines corruptness —
    ``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``), so this
    convenience split caches the parsed frame. That is fine at
    exploration scale; for a 100 TB drop use
    :func:`write_quarantine_split`, which routes both sides to disk in
    one pass with no cache.
    """
    df = df.cache()
    good = df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
    bad = df.where(df[CORRUPT_COL].isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_quarantine_split(df: DataFrame, path: str, mode: str = "error") -> None:
    """One-pass dead-letter routing for a PERMISSIVE read at scale:
    every row is written exactly once, partitioned by parse outcome
    (``is_bad=false`` subtree = clean rows, ``is_bad=true`` = rows
    with their raw line preserved). All source columns are referenced
    by the write, so the corrupt-column query restriction never
    applies and nothing is cached — the scan streams straight to the
    sink. Downstream reads of ``is_bad=false`` get partition pruning
    for free."""
    (
        df.withColumn("is_bad", df[CORRUPT_COL].isNotNull())
        .write.mode(mode)
        .partitionBy("is_bad")
        .parquet(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    row_tag: str = "row",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """XML reader (native in Spark 4 — SPARK-44265): explicit schema,
    quarantined malformed rows, same dead-letter contract as the
    CSV/JSONL readers. XML is NOT a splittable line format — one task
    per file between rowTag boundaries — so at 100 TB keep individual
    XML drops to bounded sizes (or convert at the landing zone); the
    reader is the ingest-compatibility path, parquet is the storage
    answer."""
    return (
        spark.read.schema(_with_corrupt_col(schema_ddl, mode))
        .option("rowTag", row_tag)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .format("xml")
        .load(path)
    )


def write_xml(df: DataFrame, path: str, row_tag: str = "row", mode: str = "error") -> None:
    """XML sink (one element per row under ``rowTag``)."""
    df.write.mode(mode).option("rowTag", row_tag).format("xml").save(path)
