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
