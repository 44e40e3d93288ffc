"""Streaming test-set decontamination.

The streaming half of ``operators.decontam.decontaminate``: an unbounded
ingest feed screened online against a STATIC eval corpus (benchmark
suites change rarely; the corpus never stops).

Decontamination is per-document — a doc's verdict depends only on its own
n-grams and the fixed eval digest set, never on other stream rows — so
the streaming treatment carries ZERO cross-batch state: each micro-batch
runs the exact batch operator (same broadcast digest join, same plan) and
the union of micro-batch reports equals the batch report over the same
rows, under any batch boundaries. ``foreachBatch`` is the sanctioned
shape for that (reused from ``streaming/wire_sink.py``): it hands each
micro-batch to batch code while checkpointing offsets for exactly-once
sinks.

The eval digest set is computed and PERSISTED once at query start;
each micro-batch re-broadcasts the cached set instead of re-running the
explode + distinct over the eval corpus.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from ..operators.decontam import decontaminate, eval_ngram_set


def decontam_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    eval_df: DataFrame,
    on_batch: Callable[[DataFrame, int], None],
    eval_text_col: str | None = None,
    n: int = 5,
    checkpoint_dir: str | None = None,
    eval_grams: DataFrame | None = None,
):
    """Start a streaming query reporting contamination per micro-batch.

    ``on_batch(report_df, batch_id)`` receives the batch's per-doc report
    — (id, n_ngrams, n_hits, contaminated), the same schema as batch
    ``decontaminate`` — and owns the sink write. ``eval_df`` must be a
    static (non-streaming) DataFrame.

    Pass a pre-persisted ``eval_grams`` (output of ``eval_ngram_set``) to
    share one digest set across several queries and own its lifecycle;
    otherwise the set is built and persisted here and exposed on the
    returned query as ``query.decontam_grams`` — after ``query.stop()``,
    call ``query.decontam_grams.unpersist()`` to release the cache (it is
    NOT released automatically; a long-lived session starting many
    screens without cleanup accumulates cached digest sets).

    Returns the started ``StreamingQuery``.
    """
    if eval_df.isStreaming:
        raise ValueError("eval_df must be static — benchmarks are not a stream")

    grams = (
        eval_grams
        if eval_grams is not None
        else eval_ngram_set(eval_df, eval_text_col or text_col, n).persist()
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        report = decontaminate(
            batch_df, text_col, id_col, eval_df, eval_text_col, n,
            eval_grams=grams,
        )
        on_batch(report, batch_id)

    writer = stream_df.writeStream.foreachBatch(_handle).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    query.decontam_grams = grams
    return query
