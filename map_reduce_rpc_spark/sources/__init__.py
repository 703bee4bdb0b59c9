"""Source/sink layer — the reference's ingest & output formats (E1, E4,
E5, E9, E13 in SURVEY.md §2.1) re-expressed as Spark readers/writers,
plus the partitioned-parquet sink a 100 TB deployment actually uses.
"""

from . import columnar, delimited, documents, jsonlines, sinks  # noqa: F401
