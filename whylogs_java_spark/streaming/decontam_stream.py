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
from pyspark.sql import functions as F

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
    if eval_grams is None:
        # expose only the internally built set (see the spans twin note)
        query.decontam_grams = grams
    return query


def decontam_spans_stream(
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
    """Streaming SURGICAL decontamination — the foreachBatch twin of
    ``decontam.decontaminate_spans``: each micro-batch's contaminated
    spans are excised against the same frozen eval digest set and
    ``on_batch(clean_df, batch_id)`` receives the per-doc
    (id, n_tokens, n_spans, tokens_removed, clean_text) table (the
    exact batch schema). Per-document semantics -> zero cross-batch
    state -> batch-boundary-independent (pinned by pytest).

    Digest-set lifecycle matches :func:`decontam_stream` (persisted
    once, exposed as ``query.decontam_grams`` when built here).
    """
    if eval_df is not None and eval_df.isStreaming:
        raise ValueError("eval_df must be static — benchmarks are not a stream")
    if eval_grams is None and eval_df is None:
        raise ValueError("pass eval_df or a precomputed eval_grams set")

    from ..operators.decontam import decontaminate_spans

    grams = (
        eval_grams
        if eval_grams is not None
        else eval_ngram_set(eval_df, eval_text_col or text_col, n).persist()
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        cleaned = decontaminate_spans(
            batch_df, text_col, id_col, n=n, eval_grams=grams
        )
        on_batch(cleaned, batch_id)

    writer = stream_df.writeStream.foreachBatch(_handle).outputMode("append")
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    query = writer.start()
    if eval_grams is None:
        # only the internally built-and-persisted set is exposed for
        # cleanup — attaching a CALLER-owned shared set would invite
        # generic lifecycle code to unpersist it under other queries
        query.decontam_grams = grams
    return query


# ---------------------------------------------------------------------------
# per-eval-item attribution (streaming twin of contamination_report)
# ---------------------------------------------------------------------------

_ATTR_OUT_SCHEMA = (
    "eval_id long, n_grams long, n_grams_hit long, n_docs long, "
    "hit_fraction double"
)
_ATTR_STATE_SCHEMA = "grams array<string>, docs array<long>"


def _attr_state_factory():
    import pandas as pd

    def fn(key, pdfs, state):
        grams: set[str]
        docs: set[int]
        if state.exists:
            g, d = state.get
            grams, docs = set(g), set(int(x) for x in d)
        else:
            grams, docs = set(), set()
        before = (len(grams), len(docs))
        n_grams = 0
        for pdf in pdfs:
            if len(pdf):
                n_grams = int(pdf["n_grams"].iloc[0])
            grams.update(pdf["gram"])
            docs.update(int(x) for x in pdf["doc_id"])
        if (len(grams), len(docs)) == before:
            yield pd.DataFrame(
                columns=[
                    "eval_id", "n_grams", "n_grams_hit", "n_docs",
                    "hit_fraction",
                ]
            )
            return
        state.update((sorted(grams), sorted(docs)))
        frac = round(len(grams) / max(n_grams, 1), 6) + 0.0
        yield pd.DataFrame(
            [
                (
                    int(key[0]),
                    n_grams,
                    len(grams),
                    len(docs),
                    frac,
                )
            ],
            columns=[
                "eval_id", "n_grams", "n_grams_hit", "n_docs", "hit_fraction"
            ],
        )

    return fn


def contamination_report_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    eval_df: DataFrame,
    eval_id_col: str,
    eval_text_col: str | None = None,
    n: int = 5,
) -> DataFrame:
    """Streaming per-eval-item contamination attribution — the stateful
    twin of ``operators.decontam.contamination_report``: as the corpus
    streams in, each eval item's cumulative leak counters grow; every
    micro-batch that changes an item's state emits its updated row
    (``eval_id``, ``n_grams``, ``n_grams_hit``, ``n_docs``,
    ``hit_fraction``) — the same schema and formulas as the batch
    report.

    Mechanics: the eval side is STATIC and bounded — its (gram →
    eval_id, n_grams) table is broadcast into the stream projection, so
    the per-batch work is the corpus gram explode + a broadcast join
    that keeps MATCHED grams only (≈ nothing on a clean corpus).
    ``applyInPandasWithState`` keyed on ``eval_id`` holds the distinct
    matched gram digests and doc ids; counters are monotone
    non-decreasing, so the latest row per eval item is always the
    running report. Eval items with ZERO hits never emit (their row is
    the static default — batch equivalence over the hit set is pinned
    by pytest).

    State bound: per eval item, grams ⊆ the item's own n-grams
    (bounded by the benchmark, not the corpus); the doc-id set grows
    with matched corpus docs — unbounded only if the corpus keeps
    leaking that item, which is exactly the signal the report exists to
    surface.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.decontam import ngram_digests

    if eval_df.isStreaming:
        raise ValueError("eval_df must be static — benchmarks are not a stream")
    etc = eval_text_col or text_col
    ev = (
        eval_df.select(
            F.col(eval_id_col).cast("long").alias("eval_id"),
            F.explode(ngram_digests(F.col(etc), n)).alias("gram"),
        )
        .distinct()
        .persist()
    )
    totals = ev.groupBy("eval_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    ev_keyed = ev.join(totals, "eval_id").select("gram", "eval_id", "n_grams")
    # per-doc distinct via array_distinct in the projection (a streaming
    # dropDuplicates would be a second stateful operator in the chain);
    # cross-batch dedup is the state sets' union semantics
    matched = stream_df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(
            F.array_distinct(ngram_digests(F.col(text_col), n))
        ).alias("gram"),
    ).join(F.broadcast(ev_keyed), "gram")
    out = matched.groupBy("eval_id").applyInPandasWithState(
        _attr_state_factory(),
        outputStructType=_ATTR_OUT_SCHEMA,
        stateStructType=_ATTR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    # same lifecycle contract as decontam_stream: the eval-gram cache is
    # exposed for the caller to unpersist after the query stops
    out.contamination_eval_grams = ev
    return out
