"""Zipf-skew certification of the skew-sensitive event operators
(round-6 verdict item 4).

The driver's testdata is uniform-ish over ``user_id``; real event
streams are power-law, and the reference's stress analog is its
crash-under-load suite (`/root/reference/test-mr.sh:287-333`). This
fixture remaps the sf0.01 events table so ONE user holds exactly 20 %
of all rows and the remainder follows a true Zipf(s=1.2) tail over 500
users, then re-runs the three operators the round-6 verdict named —
the salted exact-distinct, window sessionization, and the funnel —
against their unchanged DuckDB oracles ON THE SKEWED DATA. The
operators take the fixture dir through the normal ``(spark, sf_dir)``
contract, so the certified plan is byte-identical to the registered
one; only the data shape changes.

The wall-clock skew-on/skew-off ratios at 10x scale live in
``scripts/skew_bench.py`` + SCALE.md; this file is the correctness
half of the skew story.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from map_reduce_rpc_spark.plans import events

from tests.conftest import SF_DIR_MED
from tests.oracle import assert_matches

HOT_SHARE_MOD = 5  # event_id % 5 == 0 -> hot user = exactly 20% of rows
ZIPF_USERS = 500
ZIPF_S = 1.2


def make_skewed_events(src: str, dst: str) -> None:
    """Rewrite ``src`` events parquet with a Zipf-skewed user_id.

    Deterministic (hash-of-event_id inverse-CDF, no RNG state), and
    pyarrow-roundtripped so the parquet physical ts type — whatever
    this testdata generation used — is preserved bit-exactly; only the
    user_id column changes.
    """
    t = pq.read_table(src)
    event_id = np.asarray(t.column("event_id").to_pandas(), dtype=np.int64)
    hot = event_id % HOT_SHARE_MOD == 0
    # Knuth multiplicative hash -> uniform u in [0,1), then inverse-CDF
    # into a Zipf(s) distribution over users 1..ZIPF_USERS.
    u = (
        (event_id.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
    ).astype(np.float64) / 2.0**32
    w = 1.0 / np.arange(1, ZIPF_USERS + 1, dtype=np.float64) ** ZIPF_S
    cdf = np.cumsum(w) / w.sum()
    tail_user = np.searchsorted(cdf, u, side="right") + 1
    new_user = np.where(hot, 0, tail_user).astype(np.int64)
    t2 = t.set_column(
        t.schema.get_field_index("user_id"), "user_id", pa.array(new_user)
    )
    pq.write_table(t2, dst)


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("skewed_sf001")
    make_skewed_events(
        os.path.join(SF_DIR_MED, "events.parquet"),
        str(d / "events.parquet"),
    )
    return str(d)


@pytest.fixture(scope="module")
def skew_duck(skew_dir):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{skew_dir}/events.parquet')"
    )
    yield con
    con.close()


def test_fixture_is_actually_skewed(skew_duck) -> None:
    """The hot user must hold >= 18% of rows (vs ~uniform testdata) and
    the tail must be heavy-headed: top tail user > 10x the median."""
    total, hot = skew_duck.execute(
        "SELECT count(*), sum(CASE WHEN user_id = 0 THEN 1 ELSE 0 END) FROM events"
    ).fetchone()
    assert hot / total >= 0.18, f"hot share {hot / total:.3f}"
    top_tail, med_tail = skew_duck.execute(
        """
        WITH c AS (SELECT user_id, count(*) AS n FROM events
                   WHERE user_id <> 0 GROUP BY user_id)
        SELECT max(n), median(n) FROM c
        """
    ).fetchone()
    assert top_tail > 10 * med_tail, f"tail not Zipf: {top_tail} vs {med_tail}"


@pytest.mark.parametrize(
    "qname",
    [
        "salted_user_counts",
        "user_sessions",
        "funnel_conversion",
        # the split-routed join (hot keys broadcast, cold shuffle) must
        # stay row-identical to the plain-join oracle when key 0 is hot
        "early_user_activity",
        # split-and-stitch sessionization must equal the single-window
        # oracle exactly when one user owns 20% of the event stream —
        # the data shape this operator exists for
        "user_sessions_skewproof",
        # the per-user basket cap must truncate the hot user's basket
        # IDENTICALLY in both engines (the cap is the quadratic-term
        # lever; test_covis_cap_engages pins that it actually fires)
        "covisitation_lift",
    ],
)
def test_skew_sensitive_ops_match_oracle_on_zipf_data(
    spark, skew_dir, skew_duck, qname
) -> None:
    """The registered plans, unchanged, must hash-match their DuckDB
    oracles when one user holds 20% of the corpus — i.e. the salting /
    window / join-chain machinery is correct under skew, not just fast."""
    fn = getattr(events, qname)
    assert_matches(fn(spark, skew_dir), skew_duck.execute(events.EVENTS_ORACLES[qname]))


def test_covis_cap_engages_on_hot_basket(skew_duck) -> None:
    """Non-vacuity guard for the covisitation certification above: the
    hot user's distinct-item basket must exceed COVIS_USER_CAP on this
    fixture, so the oracle match certifies the TRUNCATED plan (cap
    actually firing), not just the easy uncapped case."""
    from map_reduce_rpc_spark.plans.events import COVIS_USER_CAP

    (basket,) = skew_duck.execute(
        """
        SELECT count(DISTINCT CAST(json_extract_string(props, '$.k') AS INT))
        FROM events WHERE user_id = 0
        """
    ).fetchone()
    assert basket > COVIS_USER_CAP, basket
