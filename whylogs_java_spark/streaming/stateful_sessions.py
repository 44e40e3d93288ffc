"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin lives in ``operators.sessions`` (lag + running sum — a
strict running dependency, so it cannot stream incrementally with built-in
aggregates alone; ``F.session_window`` covers windowed AGGREGATES but not
"emit each closed session exactly once as a row"). This operator keeps one
tiny state row per entity — (session_start, last_event, n_events) in epoch
micros — and:

- extends the open session while events arrive within ``gap_seconds``;
- emits a CLOSED session row the moment an event beyond the gap arrives;
- registers an event-time timeout at ``last_event + gap``; when the
  watermark passes it, the still-open session is emitted and the state
  dropped — so every session is emitted exactly once, late data within
  the watermark is still folded in, and state is bounded by the number of
  concurrently-active entities (not by history).

Arrow-batched per group (no per-row Python), the standard shape for custom
stateful operators the built-in aggregates can't express.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "entity long, session_start timestamp, session_end timestamp, "
    "n_events long, closed_by string"
)
STATE_SCHEMA = "start long, last long, n long"

_US = 1_000_000


def _session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (entity,) = key
        rows: list[tuple] = []

        def emit(start: int, last: int, n: int, reason: str) -> None:
            rows.append(
                (
                    entity,
                    pd.Timestamp(start, unit="us"),
                    pd.Timestamp(last, unit="us"),
                    n,
                    reason,
                )
            )

        if state.hasTimedOut:
            start, last, n = state.get
            emit(start, last, n, "timeout")
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(int(t.value // 1000) for t in pdf["ts"])
            ts.sort()
            start = last = n = None
            if state.exists:
                start, last, n = state.get
            for t in ts:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    emit(start, last, n, "gap")
                    start, last, n = t, t, 1
                else:
                    last = max(last, t)
                    n += 1
            if start is not None:
                state.update((start, last, n))
                state.setTimeoutTimestamp((last + gap_us) // 1000)
        yield pd.DataFrame(
            rows,
            columns=["entity", "session_start", "session_end", "n_events", "closed_by"],
        )

    return fn


def streaming_sessionize(
    stream_df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Closed-session rows from an event stream, exactly once per session.

    Output: (entity, session_start, session_end, n_events, closed_by)
    where ``closed_by`` is 'gap' (a later event opened the next session)
    or 'timeout' (the watermark passed last_event + gap).
    """
    src = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.col(entity_col).cast("long").alias("entity"),
            F.col(ts_col).alias("ts"),
        )
    )
    return src.groupBy("entity").applyInPandasWithState(
        _session_fn(gap_seconds * _US),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
