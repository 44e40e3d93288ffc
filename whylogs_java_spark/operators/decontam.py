"""Test-set decontamination for training-data pipelines.

Flags training documents that share word n-grams with a held-out
evaluation corpus — the standard pre-training hygiene pass (the GPT-3 /
PaLM "13-gram overlap" rule, here with a configurable n).

Design for scale (100 TB corpus vs a tiny benchmark suite):

- The eval side reduces to a DISTINCT set of md5 n-gram digests —
  O(benchmark size), megabytes even for large eval suites — and is
  **broadcast**: the corpus-side probe is a broadcast hash join inside
  the scan stage, no shuffle of corpus bytes, no skew surface.
- The corpus side explodes its n-grams once; the only shuffle is the
  per-document hit aggregation on ``doc_id`` (high-cardinality,
  skew-free) and it carries (doc_id, digest) pairs for MATCHED grams
  only — on a clean corpus nearly nothing.
- Digests are md5 of the space-joined gram (engine-portable, same
  family as operators/dedup.py minhash), so the whole pass is
  oracle-checkable in DuckDB.

No reference counterpart (whylogs-java has no joins — SURVEY.md §2.3);
this is a scale-path extension of the dedup family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_digests(text: Column, n: int) -> Column:
    """md5 digests of the word n-grams of ``text`` as an array column.

    Pure JVM expressions (split -> transform over an index sequence ->
    slice+join+md5). Documents with fewer than ``n`` words contribute NO
    n-grams (empty array) — a short doc cannot be "contaminated" by a
    gram longer than itself.
    """
    words = F.filter(F.split(text, " "), lambda t: t != "")
    cnt = F.size(words)
    return F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(1), cnt - n + 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(words, i, n))),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_ngram_set(eval_df: DataFrame, text_col: str, n: int) -> DataFrame:
    """DISTINCT n-gram digests of the evaluation corpus: one ``gram``
    column. This is the broadcast side — distinct-ing upstream keeps the
    broadcast table minimal."""
    return (
        eval_df.select(
            F.explode(ngram_digests(F.col(text_col), n)).alias("gram")
        ).distinct()
    )


def decontaminate(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    eval_df: DataFrame,
    eval_text_col: str | None = None,
    n: int = 5,
    eval_grams: DataFrame | None = None,
) -> DataFrame:
    """Per-document contamination report against an eval corpus.

    Output: (id, n_ngrams, n_hits, contaminated) — ``n_hits`` counts
    DISTINCT matched digests; ``contaminated`` is n_hits > 0. Filtering
    the corpus is then ``.where(~contaminated)`` (or a threshold on the
    hit ratio for fuzzy policies).

    Plan shape: broadcast(eval digests) ⋈ exploded corpus grams ->
    hash-agg on id -> left join back onto the per-doc gram counts. The
    corpus is scanned once; the only wide exchange carries matched pairs.

    ``eval_grams`` supplies a precomputed digest set (one ``gram``
    column) instead of deriving it from ``eval_df`` — pass a persisted
    set when calling repeatedly (the streaming wrapper does) so the
    distinct is not recomputed per call.
    """
    grams = (
        eval_grams
        if eval_grams is not None
        else eval_ngram_set(eval_df, eval_text_col or text_col, n)
    )
    # n_ngrams is arithmetic — max(words - n + 1, 0) — so the counts
    # branch never materializes digests; only the hits branch pays the
    # per-position md5 walk, and it pays it exactly once.
    words = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    counts = corpus.select(
        F.col(id_col),
        F.greatest(F.size(words) - n + 1, F.lit(0)).alias("n_ngrams"),
    )
    from whylogs_java_spark.operators.dedup import _spread

    hits = (
        _spread(corpus.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.explode(ngram_digests(F.col(text_col), n)).alias("gram"),
        )
        .join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_hits"))
    )
    return (
        counts.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_ngrams"),
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    eval_df: DataFrame,
    eval_id_col: str,
    eval_text_col: str | None = None,
    n: int = 5,
) -> DataFrame:
    """Per-eval-item contamination attribution — the inverse view of
    :func:`decontaminate`: for each evaluation row, how much of it leaks
    into the training corpus (which benchmark items are compromised and
    how badly), the report an eval owner reads before trusting a score.

    Output, one row per eval item:
      (eval_id, n_grams, n_grams_hit, n_docs, hit_fraction)
    — n_docs = distinct corpus documents sharing ≥1 of the item's
    n-grams; hit_fraction = n_grams_hit / n_grams (rounded 6). Items
    with fewer than ``n`` words report n_grams = 0 and zero hits.

    Scale shape: the eval side is bounded (grams broadcast); corpus
    grams are SEMI-JOINED to the eval gram set inside the scan before
    the attribution join, so only matched grams (≈ nothing on a clean
    corpus) reach the (gram → eval item) fan-out; aggregates key on the
    eval id. The corpus is scanned once.
    """
    etc = eval_text_col or text_col
    ev = eval_df.select(
        F.col(eval_id_col).alias("eval_id"),
        F.explode_outer(ngram_digests(F.col(etc), n)).alias("gram"),
    ).distinct()
    totals = ev.groupBy("eval_id").agg(
        F.count(F.col("gram")).alias("n_grams")
    )
    cg = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(ngram_digests(F.col(text_col), n)).alias("gram"),
    ).distinct()
    matched = cg.join(
        F.broadcast(ev.where(F.col("gram").isNotNull()).select("gram").distinct()),
        "gram",
        "left_semi",
    )
    hits = (
        matched.join(F.broadcast(ev), "gram")
        .groupBy("eval_id")
        .agg(
            F.countDistinct("gram").alias("n_grams_hit"),
            F.countDistinct("__doc").alias("n_docs"),
        )
    )
    return (
        totals.join(hits, "eval_id", "left")
        .select(
            F.col("eval_id"),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce("n_grams_hit", F.lit(0)).cast("long").alias("n_grams_hit"),
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            (
                F.round(
                    F.coalesce("n_grams_hit", F.lit(0))
                    / F.greatest(F.col("n_grams"), F.lit(1)),
                    6,
                )
                + F.lit(0.0)
            ).alias("hit_fraction"),
        )
    )
