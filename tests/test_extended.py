"""Extended operator coverage: as-of join, percentiles, window frames,
cube, rolling hash — each vs its DuckDB oracle."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tests.oracle import assert_matches

KEYS = [
    "purchase_asof_click",
    "order_price_percentiles",
    "daily_revenue_moving",
    "cube_sales",
    "rolling_fingerprints",
    "dup_clusters",
    "chunk_documents",
    "doc_repetition",
]


def test_connected_components_known_graph(spark):
    """CC on a hand-built graph: two components + the keeper flags."""
    from map_reduce_rpc_spark.operators.graph import dedup_keepers

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (3, 4)], ["id_a", "id_b"]
    )
    rows = {r.node: (r.component, r.is_keeper) for r in dedup_keepers(edges).collect()}
    assert rows == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (1, False),
        7: (7, True),
        9: (7, False),
    }


@pytest.mark.parametrize("name", KEYS)
def test_extended_query_matches_oracle(spark, duck, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_matches(q(spark, sf_dir), duck.sql(sql))


def test_asof_tolerance(spark, sf_dir):
    """Tolerance bounds the match window: tightening it can only null
    out matches, never change them."""
    from pyspark.sql import functions as F

    from map_reduce_rpc_spark.operators.asof import asof_join_backward
    from map_reduce_rpc_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("pts")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("cts"), "value"
    )
    loose = asof_join_backward(purchases, clicks, "user_id", "pts", "cts", ["value"])
    hour_us = 3600 * 1_000_000
    tight = asof_join_backward(
        purchases, clicks, "user_id", "pts", "cts", ["value"], tolerance_us=hour_us
    )
    lm = {r.event_id: r.matched_ts_us for r in loose.collect()}
    tm = {r.event_id: (r.matched_ts_us, r.pts) for r in tight.collect()}
    n_matched = n_nulled = 0
    for k, (mts, pts) in tm.items():
        if mts is not None:
            n_matched += 1
            assert mts == lm[k]
            assert pts - mts <= hour_us
        elif lm[k] is not None:
            n_nulled += 1
            assert lm[k] < pts - hour_us  # nulled only when out of window
    assert n_matched > 0 and n_nulled > 0


def test_approx_distinct_within_error_bound(spark, sf_dir):
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["approx_distinct_users"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_users > 0
        assert r.within_bound is True


def test_cogrouped_asof_matches_primary(spark, sf_dir):
    """cogroup().applyInPandas as-of variant must produce exactly the
    union-and-fill operator's rows — the custom-operator escape hatch
    is held to the same semantics (incl. equal-ts tie-breaks)."""
    from pyspark.sql import functions as F

    from map_reduce_rpc_spark.operators.asof import (
        asof_join_backward,
        asof_join_cogrouped,
    )
    from map_reduce_rpc_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("purchase_ts_us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("click_ts_us"), F.col("value")
    )
    kw = dict(
        on="user_id",
        left_ts="purchase_ts_us",
        right_ts="click_ts_us",
        payload_cols=["value"],
    )
    primary = asof_join_backward(purchases, clicks, **kw)
    cogrouped = asof_join_cogrouped(purchases, clicks, **kw)
    assert primary.schema == cogrouped.schema
    assert primary.exceptAll(cogrouped).count() == 0
    assert cogrouped.exceptAll(primary).count() == 0
