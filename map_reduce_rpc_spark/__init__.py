"""map_reduce_rpc_spark — a PySpark-native analytics engine.

A brand-new engine whose query surface covers everything the reference
(caleberi/map_reduce_rpc, a Go MapReduce-over-RPC implementation) can
compute — re-expressed Spark-first with DataFrame/SQL/Catalyst — plus the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) the reference lacks.

Layout:
    session     SparkSession factory tuned for local[N] and cluster scale
    tables      parquet table loaders for the test star schema
    functions/  reusable column-level transforms (text, vectors)
    operators/  composed operators (mapreduce parity, dedup, similarity, ...)
    plans/      the query library exposed through __spark_entry__.py
    streaming/  Structured Streaming operators over the events table
"""

__version__ = "0.1.0"
