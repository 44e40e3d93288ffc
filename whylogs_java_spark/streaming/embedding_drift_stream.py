"""Streaming embedding-space drift.

The streaming half of ``operators.drift.embedding_drift``:
representation monitoring over an unbounded embedding feed — each
event-time window's mean vector is compared against a STATIC reference
slice (cosine / L2 of the means, max and mean per-dimension shift), the
signal that catches a feature-pipeline regression or a corpus-mix shift
the moment a window closes.

Plan shape: ONE watermark-bounded stateful aggregation holds the
windowed per-dimension exact-integer sums — state is O(windows × dims)
two-long rows, never per-vector (the same reduction the batch operator
does, shared via ``drift.embedding_dim_sums`` atoms). The reference
reduces once at query start (materialized, O(dims) rows) and broadcasts
into each micro-batch's ``foreachBatch`` scoring join, which runs the
shared ``drift.embedding_drift_scores`` math per window — so
stream-scored windows are BIT-IDENTICAL to batch ``embedding_drift``
over the same window's rows (pinned by pytest).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ckpt import materialize
from ..operators.drift import (
    _EMB_SCALE,
    embedding_dim_sums,
    embedding_drift_scores,
)


def windowed_embedding_sums(
    stream_df: DataFrame,
    ts_col: str,
    vec_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed per-dimension integer atom sums of a streaming
    embedding column: (window_start, window_end, dim, n_cur, s_cur).
    One stateful agg; finalized rows emit in append mode when the
    watermark passes the window."""
    e = stream_df.withWatermark(ts_col, watermark).select(
        F.col(ts_col).alias("__ts"),
        F.posexplode(F.col(vec_col)).alias("dim", "__v"),
    )
    return (
        e.groupBy(F.window("__ts", window).alias("w"), "dim")
        .agg(
            F.count(F.lit(1)).alias("n_cur"),
            F.sum(
                F.floor(
                    F.col("__v").cast("double") * _EMB_SCALE + F.lit(0.5)
                ).cast("long")
            ).alias("s_cur"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "dim",
            "n_cur",
            "s_cur",
        )
    )


def embedding_drift_stream(
    stream_df: DataFrame,
    ts_col: str,
    vec_col: str,
    ref_df: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    checkpoint_dir: str | None = None,
):
    """Start a streaming query emitting one drift row per closed
    window: (window_start, window_end, n_ref, n_cur, cosine_means,
    l2_means, max_dim_shift, mean_abs_shift) — the batch
    ``embedding_drift`` schema keyed by window.

    ``ref_df`` is the static reference slice (reduced to O(dims) atom
    rows once); ``on_batch(report_df, batch_id)`` owns the sink write.
    Returns the started ``StreamingQuery``.
    """
    if ref_df.isStreaming:
        raise ValueError("ref_df must be static — the reference slice "
                         "is not a stream")
    ref = materialize(embedding_dim_sums(ref_df, vec_col, "ref"))
    sums = windowed_embedding_sums(
        stream_df, ts_col, vec_col, window=window, watermark=watermark
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        joined = batch_df.join(F.broadcast(ref), on="dim")
        on_batch(
            embedding_drift_scores(
                joined, group_cols=["window_start", "window_end"]
            ),
            batch_id,
        )

    writer = sums.writeStream.foreachBatch(_handle).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
