"""Streaming exact deduplication.

The streaming half of ``operators.dedup.exact_dedup``: an unbounded corpus
feed (a crawl, a log of ingested documents) deduplicated online on the
same canonical content key, so batch and stream pipelines agree on what
counts as a duplicate.

Scale shape: ``dropDuplicates`` is Spark's stateful distinct — state is
partitioned by the dedup key across executors (one shuffle per
micro-batch on the key), and the per-key state is just the key itself.
With ``watermark_column``/``watermark``, keys older than the watermark are
evicted, bounding state for time-ordered feeds; ``dropDuplicatesWithinWatermark``
(Spark 3.5+) extends eviction to out-of-order arrivals within the delay.
Without a watermark, state grows with |distinct keys| — the corpus-wide
exact-dedup regime, which is the same O(distinct) a batch groupBy carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.dedup import content_key


def dedup_stream(
    stream_df: DataFrame,
    text_col: str,
    watermark_column: str | None = None,
    watermark: str = "10 minutes",
    within_watermark: bool = True,
) -> DataFrame:
    """Keep the first-arriving row per canonical content key.

    Emits the input schema plus ``text_key``. First-arrival wins (the
    streaming analogue of batch exact dedup's min-id survivor — under
    at-least-once replay the SET of surviving keys is identical, while the
    surviving row id depends on arrival order; pipelines that need the
    batch min-id rule run batch dedup over the stream's compacted sink).

    Watermark modes: with ``watermark_column`` set, the default
    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark`` —
    per-KEY dedup with state bounded by the watermark delay (Spark 3.5+),
    the semantics the paragraph above describes. ``within_watermark=
    False`` falls back to ``dropDuplicates([key, watermark_column])``,
    which dedups per (key, event-time) PAIR only — identical content at
    different event times all survive; it exists for engines without the
    within-watermark operator and is a weaker guarantee, not first-arrival
    content dedup.
    """
    keyed = stream_df.withColumn("text_key", content_key(stream_df[text_col]))
    if watermark_column is not None:
        keyed = keyed.withWatermark(watermark_column, watermark)
        if within_watermark:
            return keyed.dropDuplicatesWithinWatermark(["text_key"])
        return keyed.dropDuplicates(["text_key", watermark_column])
    return keyed.dropDuplicates(["text_key"])
