"""Streaming phrase screening.

The streaming half of ``operators.retrieval.phrase_search``: exact
token-adjacent phrase matching applied at the firehose (contamination
canaries, policy phrases, attribution markers). Like the blocklist
screen this is a STATELESS projection — the phrase compiles into
array-world expressions over the token split, zero cross-batch state,
zero shuffle — so it returns a STREAMING DATAFRAME (one row per doc
with the overlap-aware match count, matches only), not a started
query; callers keep composing or hand it to their own writeStream.
Batch equivalence is structural (it IS the batch projection) and
pinned by pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.retrieval import phrase_search


def phrase_screen_stream(
    stream_df: DataFrame, text_col: str, id_col: str, phrase: str
) -> DataFrame:
    """Per-doc phrase-match report over a streaming corpus — the exact
    batch plan (a stateless projection), safe in any output mode."""
    if not stream_df.isStreaming:
        raise ValueError(
            "stream_df is not streaming — use retrieval.phrase_search "
            "for batch corpora"
        )
    return phrase_search(stream_df, text_col, id_col, phrase)
