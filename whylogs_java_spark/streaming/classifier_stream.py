"""Streaming trained-quality-filter scoring.

The streaming half of ``operators.classifier``: the logistic quality
model TRAINS once, offline, on a static labeled corpus (batch GD —
``logistic_quality_train``); the unbounded ingest feed is then SCORED
online with the frozen weight vector. This is the production deployment
shape for learned quality filters (CCNet / Gopher-style): training is a
periodic batch job, scoring is a pure per-document projection that runs
at wire speed.

Scoring is stateless — a doc's score depends only on its own text and
the fixed weights — so the streaming treatment carries ZERO cross-batch
state and no watermark: each micro-batch runs the exact batch scorer
(``logistic_quality_score`` — the same feature projection + sigmoid, all
Catalyst expressions, weights folded in as literals), and the union of
micro-batch reports equals the batch report over the same rows under any
batch boundaries. ``foreachBatch`` is the sanctioned shape for that.

At 100 TB/day this plan has no exchange at all: features, z, sigmoid and
the keep verdict all live in the scan-stage projection of each batch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators.classifier import logistic_quality_score, logistic_quality_train


def quality_score_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    on_batch: Callable[[DataFrame, int], None],
    weights: list[float] | None = None,
    train_df: DataFrame | None = None,
    train_label=None,
    n_iter: int = 3,
    lr: float = 1.0,
    threshold: float = 0.5,
    checkpoint_dir: str | None = None,
):
    """Start a streaming query scoring each micro-batch with a trained
    logistic quality model.

    Pass EITHER a frozen ``weights`` vector (the usual case — train
    offline, deploy the numbers) OR a static ``train_df`` +
    ``train_label`` column to train once at query start. ``on_batch``
    receives the batch's per-doc report — (id, score, keep), the same
    schema as batch ``logistic_quality_score`` without a label — and
    owns the sink write.

    Returns the started ``StreamingQuery``.
    """
    if weights is None and train_df is None:
        raise ValueError("provide weights or a train_df to fit them")
    if train_df is not None and train_df.isStreaming:
        raise ValueError("train_df must be static — training is a batch job")
    w = (
        weights
        if weights is not None
        else logistic_quality_train(
            train_df, text_col, id_col, train_label, n_iter=n_iter, lr=lr
        )
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        on_batch(
            logistic_quality_score(
                batch_df, text_col, id_col, w, threshold=threshold
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(_handle).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
