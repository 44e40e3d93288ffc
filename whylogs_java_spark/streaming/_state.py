"""Shared state-lifecycle knobs for the stateful streaming twins.

Every applyInPandasWithState operator whose key domain is unbounded in
an adversarial/misuse regime (band buckets, source keys, ...) takes a
``state_ttl`` knob parsed here: ``None`` keeps state forever
(NoTimeout), an int is milliseconds, and a ``"<n> <unit>"`` string
accepts seconds/minutes/hours — the processing-time idle timeout after
which a key's state row is dropped.
"""

from __future__ import annotations

from pyspark.sql.streaming.state import GroupStateTimeout

_UNIT_MS = {"seconds": 1000, "minutes": 60000, "hours": 3600000}


def parse_state_ttl(state_ttl: str | int | None):
    """-> (ttl_ms | None, GroupStateTimeout) for ``state_ttl``."""
    if state_ttl is None:
        return None, GroupStateTimeout.NoTimeout
    if isinstance(state_ttl, str):
        num, unit = state_ttl.split()
        ttl_ms = int(num) * _UNIT_MS[unit]
    else:
        ttl_ms = int(state_ttl)
    if ttl_ms <= 0:
        raise ValueError(f"state_ttl must be positive, got {state_ttl!r}")
    return ttl_ms, GroupStateTimeout.ProcessingTimeTimeout
