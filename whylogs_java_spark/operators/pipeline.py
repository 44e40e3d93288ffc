"""End-to-end training-data manifest: the composed cleaning pipeline.

The individual operators (exact dedup, near-dup cluster resolution,
decontamination, quality gating, split assignment) each exist and are
oracle-checked on their own; this module composes them into the single
pass a real pre-training pipeline runs over a raw corpus:

    raw corpus
      → exact dedup            (min-id survivor per content key)
      → near-dup resolution    (MinHash-LSH → connected components,
                                keep each cluster's min-id survivor)
      → decontamination        (drop docs sharing any word n-gram with
                                the eval corpus)
      → quality gate           (token count + chars-per-token windows)
      → split assignment       (deterministic hash-threshold
                                train/val/test)
      → manifest               (doc_id, split)

Composition is DataFrame lineage with two materialized stage boundaries
by default (``materialize=True``): the exact-dedup survivor corpus and
the near-dup survivor corpus each feed multiple downstream branches, so
they are eagerly ``localCheckpoint``-ed — the single-node analog of
staging to parquet between pipeline phases — which means CONSTRUCTING
the manifest runs those two stages as Spark jobs. Pass
``materialize=False`` for pure lazy lineage (Catalyst then sees the
whole plan and prunes/pushes across stage boundaries, at the cost of
re-deriving the shared corpus per branch). Either way, every decision
is deterministic (md5 keys, min-id survivors, exact filters), so the
WHOLE pipeline output is oracle-checkable end to end, not just stage by
stage.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import decontaminate
from .dedup import boilerplate_stats, exact_dedup, near_dup_clusters
from .sampling import assign_splits


def training_manifest(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    eval_df: DataFrame,
    near_threshold: float = 0.5,
    ngram_n: int = 5,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_chars_per_token: float = 3.0,
    max_chars_per_token: float = 10.0,
    splits: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    max_boilerplate_fraction: float | None = None,
    boiler_seg_words: int = 10,
    boiler_df_threshold: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Run the full cleaning pipeline; return the manifest (id, split).

    Quality gate: whitespace token count in [min_tokens, max_tokens] and
    chars-per-token (length/tokens) in [min_chars_per_token,
    max_chars_per_token]. The defaults are the Gopher-style window for a
    REAL corpus (50..100k words, mean word length 3..10); test/bench
    runs over the short synthetic corpora pass explicit tighter windows.

    ``max_boilerplate_fraction`` (off by default) adds the CCNet-style
    template-page gate between decontamination and the token gates: docs
    whose corpus-repeated segment fraction (``boilerplate_stats`` over
    the post-dedup survivors — dedup first, so exact copies don't inflate
    the document-frequency census) exceeds the threshold are dropped
    wholesale.
    """
    src = docs.select(id_col, text_col)
    s1 = exact_dedup(src, text_col, id_col)
    if materialize:
        # s1 feeds three consumers (the near-dup signature pipeline, the
        # survivor semi-join, and decontamination); without a stage
        # boundary each branch re-derives it from the raw scan + content
        # -hash shuffle. localCheckpoint is the single-node analog of the
        # parquet staging a cluster pipeline would do between phases —
        # set materialize=False to keep pure lineage (e.g. for plan
        # audits or when the input is already a materialized table).
        s1 = s1.localCheckpoint(eager=True)
    survivors = near_dup_clusters(
        s1, text_col, id_col, threshold=near_threshold
    ).where(F.col("is_survivor")).select(id_col)
    s2 = s1.join(survivors, id_col, "left_semi")
    if materialize:
        s2 = s2.localCheckpoint(eager=True)
    clean = decontaminate(s2, text_col, id_col, eval_df, n=ngram_n).where(
        ~F.col("contaminated")
    ).select(id_col)
    s3 = s2.join(clean, id_col, "left_semi")
    if max_boilerplate_fraction is not None:
        bp = boilerplate_stats(
            s3, text_col, id_col,
            seg_words=boiler_seg_words, df_threshold=boiler_df_threshold,
        )
        keep = bp.where(
            F.col("boilerplate_fraction") <= max_boilerplate_fraction
        ).select(id_col)
        s3 = s3.join(keep, id_col, "left_semi")
    toks = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    cpt = F.length(F.col(text_col)) / toks
    s4 = s3.where(
        toks.between(min_tokens, max_tokens)
        & cpt.between(min_chars_per_token, max_chars_per_token)
    )
    return assign_splits(s4, id_col, splits).select(id_col, "split")
