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
  the watermark is still folded in (an admitted late event earlier than
  the stored session start extends it backwards — start = min; a late
  event older than ``start - gap`` becomes its own earlier session,
  emitted closed immediately), and state is bounded by the number of
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
            # merge-of-intervals fold: the stored open session is one
            # interval item among the (sorted) event points, so an admitted
            # late event EARLIER than the stored start extends the session
            # backwards (start = min), and events older than start - gap
            # form their own earlier session(s), emitted closed immediately
            # — not silently folded into the current one.
            items: list[list[int]] = []
            if state.exists:
                s0, l0, n0 = state.get
                items.append([s0, l0, n0])
            for pdf in pdfs:
                for t in pdf["ts"]:
                    tu = int(t.value // 1000)
                    items.append([tu, tu, 1])
            items.sort(key=lambda it: (it[0], it[1]))
            cur: list[int] | None = None
            for it in items:
                if cur is None:
                    cur = it[:]
                elif it[0] - cur[1] > gap_us:
                    emit(cur[0], cur[1], cur[2], "gap")
                    cur = it[:]
                else:
                    cur[1] = max(cur[1], it[1])
                    cur[2] += it[2]
            if cur is not None:
                state.update((cur[0], cur[1], cur[2]))
                state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
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
