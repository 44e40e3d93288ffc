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

_UNIT_MS = {"second": 1000, "minute": 60000, "hour": 3600000}

_TTL_FORMS = (
    "accepted forms: int milliseconds, or '<n> seconds|minutes|hours' "
    "(singular or plural)"
)


def parse_state_ttl(state_ttl: str | int | None):
    """-> (ttl_ms | None, GroupStateTimeout) for ``state_ttl``."""
    if state_ttl is None:
        return None, GroupStateTimeout.NoTimeout
    if isinstance(state_ttl, str):
        parts = state_ttl.split()
        if len(parts) != 2:
            raise ValueError(
                f"state_ttl {state_ttl!r} is not '<n> <unit>' — {_TTL_FORMS}"
            )
        num, unit = parts
        mult = _UNIT_MS.get(unit.lower().rstrip("s"))
        if mult is None:
            raise ValueError(
                f"state_ttl unit {unit!r} unknown — {_TTL_FORMS}"
            )
        try:
            ttl_ms = int(num) * mult
        except ValueError:
            raise ValueError(
                f"state_ttl count {num!r} is not an integer — {_TTL_FORMS}"
            ) from None
    else:
        ttl_ms = int(state_ttl)
    if ttl_ms <= 0:
        raise ValueError(f"state_ttl must be positive, got {state_ttl!r}")
    return ttl_ms, GroupStateTimeout.ProcessingTimeTimeout
