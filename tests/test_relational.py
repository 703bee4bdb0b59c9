"""Relational + events queries vs the DuckDB oracle.

Runs every registered query that has an oracle (driver t2 replica) —
any new query added to __spark_entry__ is automatically covered.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from tests.oracle import assert_matches
from tests.test_parity import PARITY_KEYS

ALL_ORACLED = sorted(k for k in entry_mod.oracle_sql() if k not in PARITY_KEYS)


@pytest.mark.parametrize("name", ALL_ORACLED)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_matches(q(spark, sf_dir), duck.sql(sql))


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    missing = [k for k in entry_mod.oracle_sql() if k not in qs]
    assert not missing, f"oracles without queries: {missing}"
