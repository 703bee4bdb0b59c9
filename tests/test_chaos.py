"""Crash-recovery parity (reference test-mr.sh:287-333 analog).

Runs in a subprocess: task-retry counts are a SparkContext-construction
property (``local[8, 4]``), and the shared test session is ``local[N]``
(fail-fast).
"""

from __future__ import annotations

import os
import subprocess
import sys


def test_injected_failures_do_not_change_results():
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, "-m", "map_reduce_rpc_spark.operators.chaos"],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "CHAOS OK" in proc.stdout


def test_jaccard_pairs_cache_survives_session_recycling():
    """Round-4 regression: the shared jaccard-pair cache must be keyed
    by (applicationId, sf_dir), not sf_dir alone — a harness that
    recycles sessions (bench.py does, every 21 queries) would otherwise
    receive a DataFrame bound to a STOPPED SparkContext and fail on
    first use. Runs in a subprocess so the suite's shared session is
    untouched."""
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, ".")
from map_reduce_rpc_spark.session import get_spark
from map_reduce_rpc_spark.plans import textops
sf = "/root/testdata/sf0.001"
s1 = get_spark("recycle_a")
n1 = textops.ngram_jaccard_dups(s1, sf).count()   # populates the cache
s1.stop()
s2 = get_spark("recycle_b")
n2 = textops.dup_clusters(s2, sf).count()         # must NOT reuse s1's frame
n3 = textops.ngram_jaccard_dups(s2, sf).count()
assert n1 == n3, (n1, n3)
s2.stop()
print("RECYCLE_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RECYCLE_OK" in out.stdout
