"""Streaming n-gram novelty screening.

The streaming half of ``operators.decontam.ngram_novelty``: incoming
documents are scored online for how much NEW information they add over a
static existing corpus — the ingest-gating signal ("skip near-zero
novelty batches") a curation pipeline wants at the firehose, not after a
nightly batch.

Novelty is per-document against a FIXED reference gram set, so the
streaming treatment carries ZERO cross-batch state: the reference
reduces once to a distinct digest table (built at query start,
materialized so micro-batches never re-scan the reference corpus), and
each micro-batch runs the exact batch plan against it via
``foreachBatch`` — the union of micro-batch reports equals the batch
report over the same rows under any batch boundaries (the
``decontam_stream`` argument).

The reference digest table is broadcast into each batch's semi-join
(an ingest stream's micro-batches are small; the broadcast saves the
per-batch shuffle). For a reference too large to broadcast, pass
``broadcast_ref=False`` and the per-batch join degrades to the shuffle
semi-join of the batch operator.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..ckpt import materialize
from ..operators.decontam import ngram_novelty


def novelty_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    ref_df: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    n: int = 5,
    broadcast_ref: bool = True,
    checkpoint_dir: str | None = None,
):
    """Start a streaming query scoring each micro-batch's novelty
    against a static reference corpus.

    ``on_batch(report_df, batch_id)`` receives the batch's per-doc
    report — (id, n_grams, n_seen, n_novel, novelty), the same schema
    as batch ``ngram_novelty`` — and owns the sink write.

    Returns the started ``StreamingQuery``.
    """
    if ref_df.isStreaming:
        raise ValueError("ref_df must be static — the reference corpus "
                         "is not a stream")
    from ..operators.decontam import ngram_digests
    from pyspark.sql import functions as F

    ref_grams = materialize(
        ref_df.select(
            F.explode(ngram_digests(F.col(text_col), n)).alias("gram")
        ).distinct()
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        on_batch(
            ngram_novelty(
                batch_df, text_col, id_col,
                n=n, broadcast_ref=broadcast_ref, ref_grams=ref_grams,
            ),
            batch_id,
        )

    writer = stream_df.writeStream.foreachBatch(_handle).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
