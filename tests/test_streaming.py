"""Streaming queries vs batch DuckDB oracles (stream/batch parity)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tests.oracle import assert_matches

STREAM_KEYS = [
    "stream_hourly_counts",
    "stream_session_stats",
    "stream_stateful_sessions",
    "stream_sliding_counts",
    "stream_static_hourly",
    "stream_dedup_events",
]


@pytest.mark.parametrize("name", STREAM_KEYS)
def test_stream_matches_batch_oracle(spark, duck, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_matches(q(spark, sf_dir), duck.sql(sql))


def test_stream_and_stateful_sessionizers_agree(spark, sf_dir):
    """Built-in session_window and the applyInPandasWithState
    sessionizer must produce identical (user, start, n, cents) rows."""
    q = entry_mod.queries()
    sw = q["stream_session_stats"](spark, sf_dir).select(
        "user_id", "session_start_us", "n_events", "value_cents"
    )
    st = q["stream_stateful_sessions"](spark, sf_dir).select(
        "user_id", "session_start_us", "n_events", "value_cents"
    )
    assert sw.exceptAll(st).count() == 0
    assert st.exceptAll(sw).count() == 0
