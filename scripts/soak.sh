#!/usr/bin/env bash
# Soak harness — the test-mr-many.sh analog
# (/root/reference/test-mr-many.sh:15-23): run the full suite N times
# and fail on the first red trial. Catches flaky scheduling/timing
# behavior that a single run can miss.
#
# Usage: scripts/soak.sh [runs]   (default 3; env SOAK_RUNS overrides)
set -u
cd "$(dirname "$0")/.."

runs="${1:-${SOAK_RUNS:-3}}"
for i in $(seq 1 "$runs"); do
    echo "*** soak trial $i/$runs"
    if ! timeout -k 10s 1800s python -m pytest tests/ -x -q; then
        echo "*** FAILED TESTS IN TRIAL $i"
        exit 1
    fi
done
echo "*** PASSED ALL $runs TESTING TRIALS"
