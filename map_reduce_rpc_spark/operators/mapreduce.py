"""Generic user-defined Map/Reduce pipeline — the reference's UDF surface
(SURVEY.md §2.3) as one composable Spark operator.

The reference's entire extensibility model is a pair of Go plugin
symbols (``/root/reference/mr/types.go:56-59``):

    Map(filename, contents string) []KeyValue      # flatMap / UDTF
    Reduce(key string, values []string) string     # UDAF over full group

``run_mapreduce`` accepts the same shapes as plain Python callables and
executes them Spark-first:

- the Map UDF runs under ``mapInPandas`` (Arrow-batched; one pandas
  batch in, N output rows out — the flatMap contract, no per-row
  Python serde);
- the shuffle/sort/group stages E3-E7 (``/root/reference/mr/worker.go:
  126-133,58,63-72``) are Spark's shuffle — zero code here;
- the Reduce UDAF runs under ``applyInPandas`` per key group, receiving
  all values of the key at once, exactly the reference contract
  (``/root/reference/mr/worker.go:73``). Values are sorted before the
  call so UDFs that depend on order (the reference sorts in-reduce,
  ``/root/reference/plugins/crash.go:51-54``) are deterministic.

Scale note (100 TB): ``applyInPandas`` materializes one key group per
call — same memory contract as the reference's reduce (whole group in
RAM, ``/root/reference/mr/worker.go:40-56``). For unbounded groups
prefer a built-in aggregate; this operator exists for *arbitrary* UDF
parity, and hot keys should be pre-aggregated or salted upstream.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

MapUDF = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceUDF = Callable[[str, list[str]], str]


def run_mapreduce(kv: DataFrame, map_udf: MapUDF, reduce_udf: ReduceUDF) -> DataFrame:
    """Run a (Map, Reduce) UDF pair over a 2-col (key, value) DataFrame.

    Returns a (key string, value string) DataFrame — the reference's
    universal record type (``/root/reference/mr/types.go:25-28``).
    """
    kv = kv.select(kv.columns[0], kv.columns[1]).toDF("key", "value")

    def map_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_k: list[str] = []
            out_v: list[str] = []
            for k, v in zip(pdf["key"], pdf["value"]):
                for ok, ov in map_udf(k, v):
                    out_k.append(ok)
                    out_v.append(ov)
            yield pd.DataFrame({"key": out_k, "value": out_v})

    mapped = kv.mapInPandas(map_stage, schema="key string, value string")

    def reduce_stage(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        values = sorted(pdf["value"].tolist())
        return pd.DataFrame({"key": [key], "value": [reduce_udf(key, values)]})

    return mapped.groupBy("key").applyInPandas(reduce_stage, schema="key string, value string")
