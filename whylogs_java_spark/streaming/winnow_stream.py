"""Streaming winnowing screen — new documents fingerprinted online and
checked against a STATIC accepted-corpus print store.

Per-document verdicts (a doc's result depends only on its own prints and
the fixed store), so the streaming treatment carries ZERO cross-batch
state: each micro-batch runs the exact batch operator
(`operators.dedup.winnow_screen`) and the union of micro-batch reports
equals the batch report over the same rows under any batch boundaries —
the same `foreachBatch` shape as `decontam_stream`.

The store (winnowed prints of the reference corpus) is computed and
persisted ONCE at query start; pass a pre-persisted ``ref_prints`` to
share it across queries and own its lifecycle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import winnow_fingerprints, winnow_screen


def build_print_store(
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """(ref_id, print_hash) — the winnowed store of an accepted corpus.
    At scale this persists as a parquet table keyed by print_hash (the
    screen's join key); here it returns the DataFrame for the caller to
    persist/write."""
    return (
        winnow_fingerprints(ref_df, text_col, id_col, k, window)
        .select(F.col(id_col).alias("ref_id"), F.col("print_hash"))
        .distinct()
    )


def winnow_stream(
    stream_df: DataFrame,
    ref_df: DataFrame,
    text_col: str,
    id_col: str,
    on_batch: Callable[[DataFrame, int], None],
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    checkpoint_dir: str | None = None,
    ref_prints: DataFrame | None = None,
):
    """Start a streaming query screening each micro-batch against the
    store; ``on_batch(report_df, batch_id)`` owns the sink write. The
    built store is exposed as ``query.winnow_prints`` — unpersist it
    after ``query.stop()`` (not released automatically).
    Returns the started ``StreamingQuery``."""
    if ref_df.isStreaming:
        raise ValueError("ref_df must be static — the accepted corpus is a store")
    prints = (
        ref_prints
        if ref_prints is not None
        else build_print_store(ref_df, text_col, id_col, k, window).persist()
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        report = winnow_screen(
            batch_df, prints, text_col, id_col, k, window, min_shared
        )
        on_batch(report, batch_id)

    writer = stream_df.writeStream.foreachBatch(_handle).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    query.winnow_prints = prints
    return query
