"""Streaming blocklist screening.

The streaming half of ``operators.text.blocklist_filter``: the C4-style
term gate applied at the firehose, so blocked content never reaches the
staging corpus at all. The verdict is per-document against a FIXED term
list compiled into the projection as literal regexes — zero cross-batch
state, zero broadcast, zero shuffle — which makes this the cheapest
possible streaming operator: unlike the foreachBatch family it needs no
per-batch driver callback and composes directly into any downstream
streaming plan (filter, windowed profile, sink) as a plain stateless
projection.

``blocklist_screen_stream`` therefore returns a STREAMING DATAFRAME
(the per-doc report, same schema as the batch operator), not a started
query — callers ``.where(~blocked)`` and keep building, or hand it to
their own writeStream. Batch equivalence is structural (it IS the batch
projection applied to a streaming source) and pinned by pytest anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.text import blocklist_filter


def blocklist_screen_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    terms: "tuple[str, ...] | list[str]",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc blocklist report over a streaming corpus — a stateless
    projection (the exact batch plan), safe in any output mode."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df is not streaming — use "
                         "text.blocklist_filter for batch corpora")
    return blocklist_filter(stream_df, text_col, id_col, terms, keep_cols)
