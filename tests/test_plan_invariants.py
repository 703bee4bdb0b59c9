"""Global plan-shape regression gate: NO query may plan a
row-at-a-time Python UDF (BatchEvalPython) or an unconstrained
CartesianProduct — the two patterns that silently kill a 100 TB run.
Python is allowed only Arrow-batched (ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas); cross joins only as BroadcastNestedLoopJoin
with a broadcast side small by construction (query sets, centroids)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SMOKE_SF = "/root/testdata/sf0.001"

# streaming queries execute a full replay in their builder — their
# plan discipline is asserted by tests/test_streaming.py instead
_BATCH_QUERIES = [
    name for name in entry_mod.queries() if not name.startswith("stream_")
]

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")


@pytest.mark.parametrize("name", _BATCH_QUERIES)
def test_no_forbidden_plan_nodes(spark, name):
    df = entry_mod.queries()[name](spark, SMOKE_SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name} plans a {bad}:\n{plan[:2000]}"
