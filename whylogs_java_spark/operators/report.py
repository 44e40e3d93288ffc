"""Per-slice corpus health report — the "dataset card" aggregate.

Composes the per-document text-hygiene operators (Gopher quality gates,
encoding-hygiene scan, token counts, boilerplate saturation) into one
grouped summary a pipeline owner reads per source/language/shard before
training: how many documents, how many tokens, how many encoding-suspect
pages, and the mean quality / boilerplate saturation of the slice.

Scale shape: the three projection components chain through ``keep_cols``
into ONE corpus scan (no self-joins); only the boilerplate branch —
which needs its own segment explode and digest census regardless —
joins back on the high-cardinality doc id (skew-free), and the whole
report ends in one hash-aggregate on the slice key. Mean doubles
accumulate as exact integers (floor(x·1e6 + 0.5) summed as BIGINT — the
same magnitude-tiered-exact-sum idea as functions/metrics.py), because a
shuffled double sum is order-nondeterministic and would break the
cross-engine oracle; the inputs are already rounded to 6 decimals, so
the integerization is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import boilerplate_stats
from .text import encoding_scan, quality_metrics, token_counts

_MEAN_SCALE = 1_000_000  # exact-integer accumulator for rounded-6 inputs


def _exact_mean(col: str) -> Column:
    s = F.sum(
        F.floor(F.col(col) * _MEAN_SCALE + F.lit(0.5)).cast("long")
    )
    return (
        F.round(s / (F.count(F.lit(1)) * F.lit(float(_MEAN_SCALE))), 6) + 0.0
    )


def corpus_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    boiler_seg_words: int = 10,
    boiler_df_threshold: int = 2,
) -> DataFrame:
    """One row per ``group_col`` slice: (group, n_docs, total_tokens,
    suspect_docs, mean_quality, mean_boilerplate_frac).

    ``suspect_docs`` counts encoding-suspect documents; ``mean_quality``
    averages the Gopher composite gate score; ``mean_boilerplate_frac``
    averages the corpus-repeated segment fraction at
    ``boiler_df_threshold`` distinct docs. Deterministic end to end
    (exact counts + integerized means), so oracle-checkable.
    """
    # the three projection operators CHAIN via keep_cols — one corpus scan
    # computes quality + encoding + tokens with no self-join; only the
    # boilerplate branch (which needs its own segment explode and digest
    # census regardless) joins back on the doc id
    x = quality_metrics(
        df, text_col, id_col, keep_cols=(group_col, text_col)
    ).select(id_col, group_col, text_col, "quality")
    x = encoding_scan(
        x, text_col, id_col, keep_cols=(group_col, text_col, "quality")
    ).select(id_col, group_col, text_col, "quality", "encoding_suspect")
    x = token_counts(
        x, text_col, id_col, keep_cols=(group_col, "quality", "encoding_suspect")
    ).select(id_col, group_col, "quality", "encoding_suspect", "ws_tokens")
    b = boilerplate_stats(
        df, text_col, id_col,
        seg_words=boiler_seg_words, df_threshold=boiler_df_threshold,
    ).select(id_col, "boilerplate_fraction")
    j = x.join(b, id_col)
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_tokens"),
        F.sum(F.col("encoding_suspect").cast("long")).alias("suspect_docs"),
        _exact_mean("quality").alias("mean_quality"),
        _exact_mean("boilerplate_fraction").alias("mean_boilerplate_frac"),
    )
