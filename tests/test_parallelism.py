"""Parallelism-observation tests — the mtiming/rtiming analog.

The reference proves its workers actually run concurrently by having
each task record a wall-clock interval and checking that at least two
intervals overlap (/root/reference/test-mr.sh:150-201, plugin bodies
plugins/mtiming.go:22-94 and plugins/rtiming.go:20-87). Same assertion
here, for both a map (scan-side) stage and a reduce (post-shuffle)
stage: tasks record (start, end) timestamps; the test asserts >= 2
tasks were running at the same instant in each stage.

Sleep inside the task makes the overlap deterministic on local[8]:
8 tasks x 0.4 s cannot serialize within the window unless the
scheduler runs them one at a time.
"""

from __future__ import annotations


def _max_concurrency(intervals: list[tuple[float, float]]) -> int:
    events = sorted(
        [(s, 1) for s, _ in intervals] + [(e, -1) for _, e in intervals]
    )
    cur = best = 0
    for _, delta in events:
        cur += delta
        best = max(best, cur)
    return best


def _make_timed_partition():
    # defined as a closure so cloudpickle ships it by value — the tests
    # module itself is not importable on executor workers
    def timed_partition(iterator):
        import time as _t

        start = _t.time()
        rows = list(iterator)
        _t.sleep(0.4)
        end = _t.time()
        yield (len(rows), start, end)

    return timed_partition


def test_map_stage_parallelism(spark):
    """>= 2 concurrently-running tasks in a map-only stage."""
    n_parts = 8
    out = (
        spark.sparkContext.parallelize(range(64), n_parts)
        .mapPartitions(_make_timed_partition())
        .collect()
    )
    assert len(out) == n_parts
    assert _max_concurrency([(s, e) for _, s, e in out]) >= 2


def test_reduce_stage_parallelism(spark):
    """>= 2 concurrently-running tasks in the post-shuffle stage."""
    n_reducers = 8
    out = (
        spark.sparkContext.parallelize(range(256), 8)
        .map(lambda x: (x % 32, x))
        .groupByKey(n_reducers)
        .mapPartitions(_make_timed_partition())
        .collect()
    )
    assert len(out) == n_reducers
    # every reducer got keys, and at least two reducers overlapped
    assert sum(n for n, _, _ in out) == 32
    assert _max_concurrency([(s, e) for _, s, e in out]) >= 2


def test_observed_metrics_ride_the_job(spark, sf_dir):
    """The reference's timing/jobcount plugins observe engine behavior
    from inside a running job (SURVEY.md §2.2 W6); Spark's native
    analog is ``df.observe()``: named aggregate metrics that ride the
    existing plan — no second scan, no extra job — and are reported on
    completion. Assert the observed scan-side row count matches an
    independent recount, i.e. the observation measured the real job."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from map_reduce_rpc_spark.tables import load_table

    obs = Observation("scan_metrics")
    li = load_table(spark, sf_dir, "lineitem")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_in"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    grouped = observed.groupBy("l_returnflag").count()
    assert grouped.count() >= 1  # run the job; metrics ride along
    got = obs.get
    assert got["rows_in"] == li.count()
    assert got["min_qty"] <= got["max_qty"]
