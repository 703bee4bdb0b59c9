"""Native Spark source for the reference's ``"key value"`` text output
format, through the Spark 4 Python Data Source API (SPARK-44076).

The reference's final artifacts are ``mr-out-{R}`` text files, one
``"key value"`` line per record (``/root/reference/mr/worker.go:60-74``;
the harness merges them with ``sort mr-out*``, ``test-mr.sh:106``).
``sinks.write_kv_text`` produces that format; this source reads it back
as a FIRST-CLASS format name — ``spark.read.format("kvtext")`` — with
one input partition per reducer file, mirroring the reference's
per-reducer layout.

Why a Python DataSource and not ``spark.read.text`` + split (which
``jsonlines.py`` style would suggest): the point is pinning the Spark 4
extension surface a custom ingest format would actually use — schema
declaration, option plumbing, partition planning, per-partition
iterators — against the one bespoke format this repo genuinely has.
It is a PYTHON-worker path (rows cross the Arrow boundary), so at
100 TB the JVM-side text+split read stays the fast path; parity of the
two paths is asserted in tests/test_sources.py.

Values may themselves contain spaces (the reference's indexer packs
``"<count> <doc,doc,...>"`` into one value, ``plugins/indexer.go:40``),
so the parse splits on the FIRST space only — identical to the split
the JVM-side reader uses.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class KVFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KVTextReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("kvtext source requires .option('path', dir)")
        self.path = path

    def partitions(self) -> list[KVFilePartition]:
        # one partition per reducer output file — the reference's own
        # parallelism unit (nReduce files); deterministic order
        return [
            KVFilePartition(os.path.join(self.path, name))
            for name in sorted(os.listdir(self.path))
            if not name.startswith((".", "_"))
        ]

    def read(self, partition: KVFilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line:
                    key, _, value = line.partition(" ")
                    yield (key, value)


class KVTextDataSource(DataSource):
    """``spark.read.format("kvtext").option("path", dir)`` -> rows of
    (key string, value string)."""

    @classmethod
    def name(cls) -> str:
        return "kvtext"

    def schema(self) -> str:
        return "key string, value string"

    def reader(self, schema) -> KVTextReader:
        return KVTextReader(self.options)


def register(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(KVTextDataSource)
