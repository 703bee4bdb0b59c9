"""Columnar interchange beyond parquet: ORC read/write.

Parquet is this repo's primary format (TESTDATA.md tables, sinks.py),
but large-scale lakes are frequently ORC (Hive/Trino heritage), and
Spark ships a native vectorized ORC reader/writer with the same
optimizer contract as parquet: column pruning, predicate pushdown into
stripe/row-group statistics, and directory-partition pruning. These
wrappers mirror sinks.write_partitioned_parquet / spark.read.parquet
so a pipeline can switch formats by swapping one call.

Scale notes (100 TB): identical to parquet — pushdown reaches the scan
(`PushedFilters` in explain; asserted in tests/test_sources.py),
partition_by columns prune subtrees before IO, and stripe size
(`orc.stripe.size`) plays the role of parquet's row-group size for
split granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str, schema_ddl: str | None = None) -> DataFrame:
    """ORC reader; pass ``schema_ddl`` to pin the schema (same
    explicit-schema-always policy as the delimited sources — for ORC
    the schema lives in the file footer, so this is a cheap assertion
    rather than an inference pass, but pinning it still catches drift
    between producers)."""
    r = spark.read
    if schema_ddl is not None:
        r = r.schema(schema_ddl)
    return r.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "error",
    compression: str = "zstd",
) -> None:
    """ORC sink with directory partitioning; zstd by default (same
    ratio/speed trade as the parquet sink)."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
