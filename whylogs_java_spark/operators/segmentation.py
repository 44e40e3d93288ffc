"""Entropy-based auto-segmentation.

Re-implementation (not a copy) of the reference's PySpark helper
``estimate_segments`` (spark/python/whyspark/preprocessing/
autosegmentation.py:9-173): pick the segmentation columns that maximize
normalized information gain about a target column, under a budget on the
total number of segment combinations.

Spark-first differences from the reference:
- one cached ``groupBy(candidate cols).count()`` drives every entropy
  evaluation (the reference does this too — kept, it is the right design:
  all subsequent entropy math runs on the tiny count table, never the data);
- candidate stats (distinct counts + null counts) are gathered in a single
  aggregation pass instead of one job per column
  (autosegmentation.py:118-123 runs 2 jobs per candidate column).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def column_entropy(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Shannon entropy per column, long format: (column_name, entropy).

    H = -Σ p·log2 p with p = group count / total rows (NULL groups carry
    zero mass, matching the reference's count(col)/count semantics —
    autosegmentation.py:9-16). Single pass: the columns melt into
    (column_name, value) rows in one projection, so N columns cost ONE scan
    and one distributed aggregation instead of N+1 jobs; per-column totals
    (C rows) broadcast-join back onto the count table — no global window,
    no single-partition stage at any cardinality. Results round to 6
    decimals.
    """
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column_name"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in columns
                ]
            )
        ).alias("e")
    ).select("e.*")
    counts = melted.groupBy("column_name", "v").agg(F.count(F.lit(1)).alias("n"))
    # per-column total INCLUDING null rows (they carry zero probability
    # mass but stay in the denominator)
    totals = counts.groupBy("column_name").agg(F.sum("n").alias("__total"))
    return (
        counts.where(F.col("v").isNotNull())
        .join(F.broadcast(totals), "column_name")
        .withColumn("p", F.col("n") / F.col("__total"))
        .groupBy("column_name")
        .agg((F.round(-F.sum(F.col("p") * F.log2("p")), 6) + 0.0).alias("entropy"))
    )


def conditional_entropy_df(
    df: DataFrame, split_columns: Sequence[str], target_column: str
) -> DataFrame:
    """Weighted conditional entropy H(target | splits) as a 1-row DataFrame.

    The reference's _weighted_entropy core (autosegmentation.py:19-45) with
    data-count weights: per split cell, p from an analytic window sum, then
    Σ_split weight · (-Σ p log2 p). Deterministic to 6 decimals.
    """
    total = df.count()
    grouped = df.groupBy(*split_columns, target_column).agg(
        F.count(F.lit(1)).alias("group_count")
    )
    w = Window.partitionBy(*split_columns)
    per = grouped.withColumn(
        "p", F.col("group_count") / F.sum("group_count").over(w)
    )
    ent = per.groupBy(*split_columns).agg(
        (-F.sum(F.col("p") * F.log2("p"))).alias("entropy"),
        (F.sum("group_count") / F.lit(total)).alias("weight"),
    )
    return ent.agg(
        (F.round(F.sum(F.col("entropy") * F.col("weight")), 6) + 0.0).alias(
            "weighted_entropy"
        )
    )


def simple_entropy(df: DataFrame, column: str) -> float:
    """H(col) = -Σ p·log2 p over the value distribution (excluding NULL keys
    from probability mass the same way the reference's count/groupBy does)."""
    total = df.count()
    if total == 0:
        return 0.0
    probs = df.groupBy(column).agg((F.count(column) / total).alias("p"))
    row = probs.agg((-F.sum(F.col("p") * F.log2("p"))).alias("h")).collect()[0]
    return row["h"] or 0.0


def weighted_entropy(
    countdf: DataFrame,
    total_count: int,
    split_columns: Sequence[str],
    target_column: str,
) -> float:
    """Conditional entropy H(target | split_columns), weighted by split mass.

    Operates on the cached count table: groupBy(splits+target) -> per-split
    probability via an analytic window sum -> -Σ p log2 p per split ->
    mass-weighted sum (autosegmentation.py:19-45 semantics).
    """
    cols = list(split_columns) + [target_column]
    grouped = countdf.groupBy(*cols).agg(F.sum("count").alias("group_count"))
    w = Window.partitionBy(*split_columns) if split_columns else Window.partitionBy()
    per_split = grouped.withColumn(
        "p", F.col("group_count") / F.sum("group_count").over(w)
    )
    entropy = per_split.groupBy(*split_columns).agg(
        (-F.sum(F.col("p") * F.log2("p"))).alias("entropy"),
        (F.sum(F.col("group_count") / total_count)).alias("weight"),
    )
    row = entropy.agg(F.sum(F.col("entropy") * F.col("weight")).alias("we")).collect()[0]
    return row["we"] or 0.0


def weighted_entropies_batch(
    countdf: DataFrame,
    total_count: int,
    prev_split_columns: Sequence[str],
    candidates: Sequence[str],
    target_column: str,
) -> dict[str, float]:
    """H(target | prev + [c]) for EVERY candidate c in ONE aggregation.

    The count table melts once — each row explodes to (candidate,
    candidate-value) pairs — so scoring N candidates costs one job over
    N × |count table| rows instead of N windowed jobs
    (``find_best_split`` used to launch one Spark job per candidate per
    greedy round; on a 1000-column candidate set that is 1000 jobs vs 1).
    The candidate value is stringified to share one struct type across
    heterogeneous columns; within a column the cast preserves value
    distinctness, so the grouping (and the entropy) is unchanged.
    """
    cands = list(candidates)
    prev = list(prev_split_columns)
    melted = countdf.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("__cand"),
                        F.col(c).cast("string").alias("__cv"),
                    )
                    for c in cands
                ]
            )
        ).alias("e"),
        *prev,
        target_column,
        "count",
    ).select("e.*", *prev, target_column, "count")
    grouped = melted.groupBy("__cand", *prev, "__cv", target_column).agg(
        F.sum("count").alias("group_count")
    )
    w = Window.partitionBy("__cand", *prev, "__cv")
    per_split = grouped.withColumn(
        "p", F.col("group_count") / F.sum("group_count").over(w)
    )
    entropy = per_split.groupBy("__cand", *prev, "__cv").agg(
        (-F.sum(F.col("p") * F.log2("p"))).alias("entropy"),
        (F.sum(F.col("group_count") / total_count)).alias("weight"),
    )
    rows = (
        entropy.groupBy("__cand")
        .agg(F.sum(F.col("entropy") * F.col("weight")).alias("we"))
        .collect()
    )
    got = {r["__cand"]: (r["we"] or 0.0) for r in rows}
    return {c: got.get(c, 0.0) for c in cands}


def find_best_split(
    countdf: DataFrame,
    prev_split_columns: list[str],
    candidates: Sequence[str],
    target_column: str,
    normalization: dict[str, int] | None = None,
) -> tuple[float, str | None]:
    """Greedy argmax of (normalized) information gain over candidates.

    All candidates score in one melted aggregation
    (``weighted_entropies_batch``) — O(1) Spark jobs per greedy round
    regardless of candidate count, same math and pinned outcomes as the
    reference's per-candidate loop (autosegmentation.py:48-74).

    NOTE: the weight denominator is the count-table row count (number of
    distinct value combinations), faithfully matching the reference
    (autosegmentation.py:54 ``total_count = countdf.count()``) — its pinned
    test outcomes depend on this.
    """
    total = countdf.count()
    if total == 0:
        return 0.0, None
    cands = [c for c in candidates if c != target_column]
    if not cands:
        return 0.0, None
    base = weighted_entropy(countdf, total, prev_split_columns, target_column)
    ents = weighted_entropies_batch(
        countdf, total, prev_split_columns, cands, target_column
    )
    best: tuple[float, str | None] = (0.0, None)
    for c in cands:
        gain = base - ents[c]
        if normalization and normalization.get(c, 0) > 1:
            gain /= math.log(normalization[c])
        if gain > best[0]:
            best = (gain, c)
    return best


def estimate_segments(
    df: DataFrame,
    target_field: str | None = None,
    max_segments: int = 30,
    include_columns: Sequence[str] = (),
    unique_perc_bounds: tuple[float | None, float | None] = (None, 0.8),
    null_perc_bounds: tuple[float | None, float | None] = (None, 0.2),
) -> list[str]:
    """Greedy entropy-based segmentation column selection.

    Candidate filter: string (or explicitly included) columns whose
    unique%/null% fall inside the bounds (upper bounds exclusive,
    autosegmentation.py:121-133). Without a target, the max-normalized-
    entropy candidate becomes the target (:139-148). Greedy selection stops
    when the segment-combination budget is exhausted (:157-172).
    """
    lo_u = unique_perc_bounds[0] if unique_perc_bounds[0] is not None else float("-inf")
    hi_u = unique_perc_bounds[1] if unique_perc_bounds[1] is not None else float("inf")
    lo_n = null_perc_bounds[0] if null_perc_bounds[0] is not None else float("-inf")
    hi_n = null_perc_bounds[1] if null_perc_bounds[1] is not None else float("inf")

    candidates = {
        c
        for c, t in df.dtypes
        if t == "string" or c in set(include_columns)
    }
    if not candidates:
        return []

    # one pass for total count + per-candidate distinct & null counts
    stats_row = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[F.approx_count_distinct(c).alias(f"{c}__u") for c in candidates],
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nul")
            for c in candidates
        ],
    ).collect()[0]
    count = stats_row["__total"]
    n_uniques = {c: stats_row[f"{c}__u"] for c in candidates}
    n_nulls = {c: stats_row[f"{c}__nul"] for c in candidates}

    valid = set()
    for c in candidates:
        null_perc = 0.0 if count == 0 else n_nulls[c] / count
        unique_perc = 0.0 if count == 0 else n_uniques[c] / count
        if (
            n_uniques[c] > 1
            and lo_n <= null_perc < hi_n
            and lo_u <= unique_perc < hi_u
        ):
            valid.add(c)
    if not valid:
        return []

    if not target_field:
        best = (float("-inf"), None)
        for c in valid:
            h = simple_entropy(df, c)
            if n_uniques[c] > 1:
                h /= math.log(n_uniques[c])
            if h > best[0]:
                best = (h, c)
        target_field = best[1]
    assert target_field in df.columns
    valid.add(target_field)
    valid_list = sorted(valid)

    countdf = df.select(*valid_list).groupBy(*valid_list).count().cache()
    try:
        segments: list[str] = []
        segments_used = 1
        while segments_used < max_segments:
            eligible = [
                c
                for c in valid_list
                if c not in segments
                and n_uniques[c] * segments_used <= (max_segments - segments_used)
            ]
            _, chosen = find_best_split(
                countdf, segments, eligible, target_field, n_uniques
            )
            if not chosen:
                break
            segments.append(chosen)
            segments_used *= n_uniques[chosen]
        return segments
    finally:
        countdf.unpersist()
