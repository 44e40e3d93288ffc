"""Trained document-quality classifier — logistic regression over the
Gopher quality features, expressed entirely as relational algebra.

The CCNet/fastText-style "quality filter" step of a pre-training
pipeline: instead of hand-set gate thresholds (`text.quality_metrics`'s
composite), TRAIN a linear model against a supervision signal (a
known-clean slice, a language flag, human labels) and score the corpus
with it. Batch gradient descent, deterministic by construction:

- features are the already-rounded quality signals plus ln(1+wc), so
  every x_i is an exact 6-decimal double identical across engines;
- each iteration's gradient is a single aggregate over the corpus whose
  per-row contributions round to exact integer atoms BEFORE the sum
  (order-free — the ``functions/metrics.py`` pattern), so the weight
  trajectory is bit-reproducible;
- weight updates happen driver-side on ONE collected row per iteration
  (7 scalars — the same tiny-collect loop shape as k-means and the
  reference's own ``estimate_segments``).

The ENTIRE training run — fixed ``n_iter`` iterations, no convergence
check — replays in DuckDB as unrolled CTEs, so the scored output is
oracle-checkable end to end, not just the final scoring pass.

Scale shape: the feature table is built once (one corpus scan),
materialize()-ed (ckpt seam), and each iteration costs one aggregate over it
(6 long sums + a count); scoring is a pure projection with literal
weights. State is O(features), never O(corpus).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ckpt import materialize_lazy

_GRAD_SCALE = 1_000_000

#: feature names in model order; x0 is the intercept
FEATURES = ("x0", "x1", "x2", "x3", "x4", "x5")


def _feature_table(
    df: DataFrame, text_col: str, id_col: str, label: Column
) -> DataFrame:
    """(id, __y, x0..x5) — intercept, ln(1+wc), mean word len, stopword/
    punct/digit ratios; rows with zero tokens dropped (their ratio
    features are undefined)."""
    from .text import quality_metrics

    d2 = df.withColumn("__y", label.cast("double"))
    q = quality_metrics(d2, text_col, id_col, keep_cols=("__y",))
    return q.where(F.col("word_count") > 0).select(
        F.col(id_col),
        F.col("__y"),
        F.lit(1.0).alias("x0"),
        # features normalized to ~[0, 1] so unit-lr batch GD is stable
        # (unnormalized ln(wc)/word-length scales made the loss diverge)
        (
            F.round(F.log(F.lit(1.0) + F.col("word_count")) / F.lit(10.0), 6)
            + F.lit(0.0)
        ).alias("x1"),
        (F.round(F.col("mean_word_len") / F.lit(12.0), 6) + F.lit(0.0)).alias(
            "x2"
        ),
        F.col("stopword_ratio").alias("x3"),
        F.col("punct_ratio").alias("x4"),
        F.col("digit_ratio").alias("x5"),
    )


def _z(weights: list[float]) -> Column:
    z = F.lit(float(weights[0])) * F.col("x0")
    for i in range(1, len(FEATURES)):
        z = z + F.lit(float(weights[i])) * F.col(FEATURES[i])
    return z


def logistic_quality_train(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label: Column,
    n_iter: int = 3,
    lr: float = 1.0,
    stats: dict | None = None,
) -> list[float]:
    """Train; return the weight vector [w0..w5] (w0 = intercept).

    If ``stats`` is given, records ``stats["prior"]`` = mean(y) — the
    base rate, exact (0/1 double sums are integer-exact), used by the
    ``threshold="prior"`` gating mode."""
    feats = materialize_lazy(_feature_table(df, text_col, id_col, label))
    return _train_on_feats(feats, n_iter, lr, stats=stats)


def _prior_stats(feats: DataFrame, stats: dict) -> None:
    r = feats.agg(
        F.sum("__y").alias("sy"), F.count(F.lit(1)).alias("n")
    ).first()
    stats["prior"] = (r["sy"] / r["n"]) if r["n"] else 0.0
    stats["n"] = r["n"]


def _train_on_feats(
    feats: DataFrame, n_iter: int, lr: float, stats: dict | None = None
) -> list[float]:
    """``n_iter`` batch-GD rounds. When ``stats`` is given, the prior
    (mean(y) — an exact 0/1 integer sum) rides the FIRST iteration's
    aggregate instead of a separate job (guide §5): same feature table,
    same exact values, one fewer full-scan action. The feature table
    may arrive lazily checkpointed — the first aggregate materializes
    it for every later consumer."""
    w = [0.0] * len(FEATURES)
    for it in range(n_iter):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w)))
        aggs = [
            F.sum(
                F.floor(
                    F.round((p - F.col("__y")) * F.col(x), 6)
                    * _GRAD_SCALE
                    + F.lit(0.5)
                ).cast("long")
            ).alias(f"s{i}")
            for i, x in enumerate(FEATURES)
        ]
        extra = (
            [F.sum("__y").alias("sy")]
            if stats is not None and it == 0
            else []
        )
        row = feats.agg(F.count(F.lit(1)).alias("n"), *aggs, *extra).first()
        n = row["n"]
        if stats is not None and it == 0:
            stats["prior"] = (row["sy"] / n) if n else 0.0
            stats["n"] = n
        if not n:
            return w
        w = [
            w[i] - lr * ((row[f"s{i}"] / n) / _GRAD_SCALE)
            for i in range(len(FEATURES))
        ]
    if stats is not None and n_iter <= 0:
        # zero-iteration callers still get the prior (separate agg —
        # nothing to ride on)
        _prior_stats(feats, stats)
    return w


def logistic_quality_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: list[float],
    label: Column | None = None,
    threshold: float = 0.5,
) -> DataFrame:
    """Score with a trained weight vector.

    Output: (id, [is_target,] score, keep) — ``is_target`` included when
    ``label`` is given (eval convenience); ``keep`` = score >= threshold.
    """
    lbl = label if label is not None else F.lit(0.0)
    feats = _feature_table(df, text_col, id_col, lbl)
    score = (
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights))), 6)
        + F.lit(0.0)
    )
    cols = [F.col(id_col)]
    if label is not None:
        cols.append((F.col("__y") > 0).alias("is_target"))
    return feats.select(
        *cols,
        score.alias("score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def quality_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label: Column,
    n_iter: int = 3,
    lr: float = 1.0,
    threshold: float | str = 0.5,
) -> DataFrame:
    """Train + score in one call (the corpus supervises itself via
    ``label``, e.g. a known-clean source flag).

    ``threshold="prior"`` gates at the target base rate mean(y) instead
    of a fixed probability — the right cut when the score scale is not
    calibrated (few GD iterations, unnormalized features): it keeps the
    docs the model ranks above the corpus's own target-ness."""
    # ONE feature table serves the prior, every training iteration, AND
    # the final scoring (scoring through logistic_quality_score would
    # rebuild the features from raw text — a whole extra corpus pass).
    # The checkpoint is LAZY and the prior rides iteration 1's gradient
    # aggregate: the first GD job materializes the table and returns
    # the prior in the same pass (guide §5 — two fewer driver actions).
    feats = materialize_lazy(_feature_table(df, text_col, id_col, label))
    st: dict = {}
    w = _train_on_feats(feats, n_iter, lr, stats=st)
    prior = st["prior"]
    thr = prior if threshold == "prior" else float(threshold)
    score = (
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w))), 6) + F.lit(0.0)
    )
    return feats.select(
        feats.columns[0],
        (F.col("__y") > 0).alias("is_target"),
        score.alias("score"),
        (score >= F.lit(float(thr))).alias("keep"),
    )
