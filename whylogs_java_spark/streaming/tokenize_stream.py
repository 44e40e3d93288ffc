"""Streaming subword tokenization.

The streaming half of ``operators.tokenizer.bpe_apply``: once the merge
table is FROZEN (trained by ``bpe_train`` on a reference corpus — the
tokenizer is a versioned artifact, never re-learned per batch), encoding
is a pure per-row projection (the chained wrapped-symbol replaces are
plan literals, zero joins, zero state, zero shuffle), so the streaming
twin returns a STREAMING DATAFRAME that composes into any downstream
plan — exactly the ``blocklist_stream`` shape.

Freezing is semantically required, not just cheap: a tokenizer that
drifted with batch composition would change the meaning of every token
id downstream. A streaming merge table is refused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.tokenizer import bpe_apply


def bpe_apply_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    merges: "DataFrame | list[tuple]",
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_tokens, tokens) for a streaming corpus against a frozen
    merge table — a stateless projection, safe in any output mode."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df is not streaming — use "
                         "tokenizer.bpe_apply for batch corpora")
    if isinstance(merges, DataFrame) and merges.isStreaming:
        raise ValueError(
            "merges must be a STATIC merge table (bpe_train output) — "
            "a tokenizer that drifts with batch composition changes "
            "the meaning of every token downstream"
        )
    return bpe_apply(stream_df, text_col, id_col, merges, lowercase)
