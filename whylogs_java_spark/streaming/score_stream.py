"""Streaming quality-tier scoring (CCNet buckets at the firehose).

The streaming half of ``operators.sampling.score_buckets``: tier
cutoffs are frozen ONCE from a reference corpus
(``sampling.score_cutoffs`` — per-stratum exact quantiles, O(strata)
rows), and the stream assignment is the exact batch plan
(``score_buckets_with``): a broadcast join against the tiny cutoff
table plus a scan-side CASE. Zero cross-batch state, no foreachBatch
callback — the returned STREAMING DATAFRAME composes into any
downstream plan (keep the head, sample the middle, drop the tail).

Freezing is semantically load-bearing, not just an optimization: tiers
re-derived per micro-batch would drift with batch composition, so two
identical documents arriving in different batches could land in
different tiers. Against frozen cutoffs the verdict is per-document and
batch-boundary-independent (batch equivalence pinned by pytest).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

from ..operators.sampling import score_buckets_with


def score_buckets_stream(
    stream_df: DataFrame,
    cutoffs: DataFrame,
    id_col: str,
    score_col: str,
    stratum_col: str | None = None,
    labels: Sequence[str] = ("head", "middle", "tail"),
) -> DataFrame:
    """Tier labels for a streaming scored source against FROZEN
    cutoffs — a stateless projection, safe in any output mode."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df is not streaming — use "
                         "sampling.score_buckets for batch corpora")
    if cutoffs.isStreaming:
        raise ValueError(
            "cutoffs must be a STATIC cutoff table (score_cutoffs over "
            "a reference corpus) — deriving quantiles from the stream "
            "itself would make tiers depend on batch boundaries"
        )
    return score_buckets_with(
        stream_df, cutoffs, id_col, score_col, stratum_col, labels
    )
