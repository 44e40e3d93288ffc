"""Batch sessionization: gap-based event sessions.

Beyond the reference (whylogs-java has no event semantics); the batch
complement of the streaming ``session_window`` path, for event-pipeline
feature building at scale.

Algorithm (pure window functions — one shuffle on the entity key):
lag(ts) per entity -> session-break flag when the gap exceeds the
threshold -> running sum of breaks = session index. Ordering ties break on
the id column so results are deterministic.

Skew bound: a single mega-entity serializes into one task — the window
must see that entity's events in time order, and gap-based session indices
are a strict running dependency (a salted split would renumber sessions
across salt boundaries). The bound is O(n_entity log n_entity) for the
per-task sort, which Spark spills to disk rather than OOMing; measured on
local[32], one entity with 1,000,000 events sessionizes in a few seconds
(pinned by ``test_sessionize_mega_entity_skew``). Entities above ~10^8
events should be range-bucketed by time first and stitched at bucket
boundaries — at that point the data is a stream, and the streaming
``session_window`` path is the right tool.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Input rows + (session_idx, session_start flag).

    ``session_idx`` is 0-based per entity in time order.
    """
    order = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    micros = F.unix_micros(F.col(ts_col))
    prev = F.lag(micros).over(w)
    is_break = F.when(
        prev.isNull() | ((micros - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    out = df.withColumn("__brk", is_break)
    return out.withColumn(
        "session_idx",
        (F.sum("__brk").over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1).cast(
            "long"
        ),
    ).drop("__brk")


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-session aggregates: (entity, session_idx, n_events,
    session_start, session_end, duration_sec)."""
    s = sessionize(df, entity_col, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(entity_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        # floor-division (not cast) — CAST(double AS BIGINT) truncates in
        # Spark but rounds in DuckDB; FLOOR agrees everywhere
        F.floor(
            (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col)))
            / F.lit(1_000_000.0)
        ).alias("duration_sec"),
    )
