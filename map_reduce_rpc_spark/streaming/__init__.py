"""Structured Streaming layer.

The reference has no streaming of any kind (SURVEY.md §2.4 — its
coordinator "watchers" are task timeouts, not event-time logic). This
package gives the engine the streaming surface a modern pipeline needs:
file-source streams, watermarked tumbling/session windows, and a custom
stateful sessionizer via ``applyInPandasWithState``.

Batch/stream parity is the correctness story: every streaming query is
run to completion with ``Trigger.AvailableNow`` and must produce the
same rows as the equivalent batch SQL on the same events — which is
exactly what the DuckDB oracles check.
"""

from . import core, stateful, windows  # noqa: F401
