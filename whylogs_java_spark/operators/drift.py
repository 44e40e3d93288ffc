"""Distribution drift between two data slices — the downstream read of a
whylogs profile.

The reference produces mergeable profiles; the thing consumers DO with
two profiles (yesterday vs today, train vs serve) is compare them. These
operators compute the standard drift suite directly from two slices of
raw data in one aggregation pass per slice, so the comparison is exact
(not sketch-derived) and oracle-checkable:

- ``numeric_drift``: per (group, column) — counts, null rates, moments,
  plus PSI and the binned CDF L-inf distance ("binned KS") over shared
  equal-width or caller-supplied bins.
- ``categorical_drift``: per (group,) — PSI / L1 (total variation) /
  binned L-inf over category frequencies, full-outer-joined so
  categories present in only one slice count against drift.

Scale shape: each slice is scanned once into a per-(group, bin) partial
HashAggregate — the shuffle carries O(groups × bins) rows, never data
rows. The two binned tables join on (group, bin): both sides are
aggregate-sized, so the join is trivially broadcastable. A 100 TB slice
costs exactly its column-pruned scan.

PSI convention: bins where either side is empty use the standard epsilon
substitution (p -> max(p, eps)) so the sum stays finite; eps defaults to
1e-6 and is part of the contract (the same substitution a monitoring
system applies).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_EPS = 1e-6

# sentinel category NULLs map to (SQL NULL join keys never equal each
# other); shared with streaming/drift_stream.py
NULL_CAT = "\x00null"


def _valid_value(v):
    """NULL ∪ NaN ∪ ±Inf are non-values — the package null convention
    (functions/predicates.null_predicate, mirrored here on an
    already-double column)."""
    return v.isNotNull() & ~F.isnan(v) & (F.abs(v) != F.lit(float("inf")))


def _bin_index(v, splits: Sequence[float]):
    """Split-point bin index: bin i = [s_{i-1}, s_i) with open ends,
    mirroring summary.histogram_custom_splits."""
    bin_idx = F.lit(0)
    for i, s in enumerate(sorted(float(x) for x in splits)):
        bin_idx = F.when(v >= F.lit(s), F.lit(i + 1)).otherwise(bin_idx)
    return bin_idx


def _psi_cdf_terms(keys: Sequence[str], a: str, b: str, eps: float):
    """(psi_term, cdf_gap) column pair over a binned-counts table with
    count columns ``a``/``b``, windowed per ``keys`` ordered by `bin`.
    The shared core of numeric_drift / rolling_drift (and the same math
    drift_stream.drift_scores applies against a precomputed reference)."""
    tot_a = F.sum(a).over(_group_window(keys))
    tot_b = F.sum(b).over(_group_window(keys))
    pa = F.greatest(F.coalesce(F.try_divide(F.col(a), tot_a), F.lit(0.0)), F.lit(eps))
    pb = F.greatest(F.coalesce(F.try_divide(F.col(b), tot_b), F.lit(0.0)), F.lit(eps))
    cum_a = F.coalesce(
        F.try_divide(F.sum(a).over(_group_window(keys, order="bin")), tot_a),
        F.lit(0.0),
    )
    cum_b = F.coalesce(
        F.try_divide(F.sum(b).over(_group_window(keys, order="bin")), tot_b),
        F.lit(0.0),
    )
    psi_term = (pa - pb) * (F.log(pa) - F.log(pb))
    cdf_gap = F.abs(cum_a - cum_b)
    return psi_term, cdf_gap


def _binned_counts(
    df: DataFrame,
    column: str,
    splits: Sequence[float],
    group_by: Sequence[str],
    side: str,
) -> DataFrame:
    """(keys..., bin, n_<side>) exact counts over valid values."""
    keys = list(group_by)
    v = F.col(column).cast("double")
    return (
        df.where(_valid_value(v))
        .select(*keys, _bin_index(v, splits).alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias(f"n_{side}"))
    )


def numeric_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    splits: Sequence[float],
    group_by: Sequence[str] = (),
    eps: float = PSI_EPS,
) -> DataFrame:
    """Drift metrics for one numeric column between slices A and B.

    Output, one row per group: (keys..., column_name, count_a, count_b,
    null_rate_a, null_rate_b, mean_a, mean_b, mean_delta, stddev_a,
    stddev_b, psi, cdf_linf). ``splits`` are the shared bin edges (use
    ``auto_splits`` for data-driven equal-width edges); stddev is the
    population form (whylogs reports sample stddev — here both slices
    use stddevPop so the comparison is self-consistent and exact).
    """
    keys = list(group_by)
    v = F.col(column).cast("double")
    ok = _valid_value(v)

    def _stats(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias(f"count_{side}"),
            F.sum(F.when(~ok, 1).otherwise(0)).alias(f"nulls_{side}"),
            F.avg(F.when(ok, v)).alias(f"mean_{side}"),
            F.stddev_pop(F.when(ok, v)).alias(f"stddev_{side}"),
        )

    sa = _stats(df_a, "a")
    sb = _stats(df_b, "b")
    ba = _binned_counts(df_a, column, splits, keys, "a")
    bb = _binned_counts(df_b, column, splits, keys, "b")

    # A USING full-outer join coalesces the join keys into single
    # output columns, so the post-join select can name them directly.
    bins = ba.join(bb, on=keys + ["bin"], how="full").select(
        *keys,
        "bin",
        F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
    )

    # try_divide inside _psi_cdf_terms: a slice with zero valid rows in
    # a group (or a group present on one side only) yields p=0 -> eps,
    # not a division error.
    psi_term, cdf_gap = _psi_cdf_terms(keys, "n_a", "n_b", eps)
    per_bin = bins.select(
        *keys,
        psi_term.alias("__psi_term"),
        cdf_gap.alias("__cdf_gap"),
    )
    drift = per_bin.groupBy(*keys).agg(
        F.sum("__psi_term").alias("psi"),
        F.max("__cdf_gap").alias("cdf_linf"),
    )

    if keys:
        out = sa.join(sb, on=keys, how="full").join(drift, on=keys, how="left")
    else:
        out = sa.crossJoin(sb).crossJoin(drift)
    ca, cb = F.col("count_a"), F.col("count_b")
    return out.select(
        *keys,
        F.lit(column).alias("column_name"),
        F.coalesce(ca, F.lit(0)).alias("count_a"),
        F.coalesce(cb, F.lit(0)).alias("count_b"),
        F.try_divide(F.col("nulls_a"), ca).alias("null_rate_a"),
        F.try_divide(F.col("nulls_b"), cb).alias("null_rate_b"),
        F.col("mean_a"),
        F.col("mean_b"),
        (F.col("mean_b") - F.col("mean_a")).alias("mean_delta"),
        F.col("stddev_a"),
        F.col("stddev_b"),
        F.col("psi"),
        F.col("cdf_linf"),
    )


def _group_window(keys: Sequence[str], order: str | None = None):
    from pyspark.sql import Window

    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    if order is not None:
        return w.orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    return w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)


def categorical_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    column: str,
    group_by: Sequence[str] = (),
    eps: float = PSI_EPS,
) -> DataFrame:
    """Category-frequency drift between slices A and B.

    Output per group: (keys..., column_name, n_categories, psi, l1,
    linf). NULL categories count as a category of their own (monitoring
    cares when nulls appear) — they are mapped to a sentinel string so
    the full-outer join matches them across slices (SQL NULL keys never
    equal each other). l1 is twice the total variation distance; linf
    the largest single-category frequency gap.
    """
    keys = list(group_by)
    cat = F.coalesce(F.col(column).cast("string"), F.lit(NULL_CAT))

    def _counts(df: DataFrame, side: str) -> DataFrame:
        return df.groupBy(*keys, cat.alias("__cat")).agg(
            F.count(F.lit(1)).alias(f"n_{side}")
        )

    ca, cb = _counts(df_a, "a"), _counts(df_b, "b")
    both = ca.join(cb, on=keys + ["__cat"], how="full").select(
        *keys,
        "__cat",
        F.coalesce(F.col("n_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("n_b"), F.lit(0)).alias("n_b"),
    )
    tot_a = F.sum("n_a").over(_group_window(keys))
    tot_b = F.sum("n_b").over(_group_window(keys))
    # an empty slice in a group means every category frequency is 0 on
    # that side (drifted-in group), not an error
    pa_raw = F.coalesce(F.try_divide(F.col("n_a"), tot_a), F.lit(0.0))
    pb_raw = F.coalesce(F.try_divide(F.col("n_b"), tot_b), F.lit(0.0))
    pa = F.greatest(pa_raw, F.lit(eps))
    pb = F.greatest(pb_raw, F.lit(eps))
    per_cat = both.select(
        *keys,
        ((pa - pb) * (F.log(pa) - F.log(pb))).alias("__psi_term"),
        F.abs(pa_raw - pb_raw).alias("__gap"),
    )
    return per_cat.groupBy(*keys).agg(
        F.lit(column).alias("column_name"),
        F.count(F.lit(1)).alias("n_categories"),
        F.sum("__psi_term").alias("psi"),
        F.sum("__gap").alias("l1"),
        F.max("__gap").alias("linf"),
    )


def rolling_drift(
    df: DataFrame,
    column: str,
    time_column: str,
    splits: Sequence[float],
    group_by: Sequence[str] = (),
    eps: float = PSI_EPS,
) -> DataFrame:
    """PSI + binned-CDF L-inf of each day's distribution vs the PREVIOUS
    calendar day — continuous monitoring over a time-series table.

    Output per (keys..., day) with a non-empty previous day:
    (keys..., day, column_name, count_cur, count_prev, psi, cdf_linf).
    Days whose previous calendar day has no rows (including the first
    day) are dropped — there is nothing to compare against; a gap day
    therefore also resets the comparison rather than silently comparing
    across the gap.

    One scan reduces the table to per-(day, keys, bin) counts; the
    "previous day" side is the SAME aggregate shifted by one day, so the
    self-join and the PSI windows run over O(days × groups × bins) rows.
    At 100 TB this costs the column-pruned scan plus aggregate-sized
    exchanges — never a second data pass.
    """
    keys = list(group_by)
    day = F.col(time_column).cast("date").alias("__day")
    v = F.col(column).cast("double")
    binned = (
        df.where(_valid_value(v))
        .select(day, *keys, _bin_index(v, splits).alias("bin"))
        .groupBy("__day", *keys, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cur = binned.select(
        F.col("__day"), *keys, "bin", F.col("n").alias("n_cur")
    )
    prev = binned.select(
        F.date_add("__day", 1).alias("__day"),
        *keys,
        "bin",
        F.col("n").alias("n_prev"),
    )
    both = cur.join(prev, on=["__day", *keys, "bin"], how="full").select(
        "__day",
        *keys,
        "bin",
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        F.coalesce(F.col("n_prev"), F.lit(0)).alias("n_prev"),
    )
    wk = ["__day", *keys]
    psi_term, cdf_gap = _psi_cdf_terms(wk, "n_cur", "n_prev", eps)
    per = both.select(
        "__day",
        *keys,
        F.col("n_cur"),
        F.col("n_prev"),
        psi_term.alias("__psi_term"),
        cdf_gap.alias("__cdf_gap"),
    )
    out = per.groupBy("__day", *keys).agg(
        F.sum("n_cur").alias("count_cur"),
        F.sum("n_prev").alias("count_prev"),
        F.sum("__psi_term").alias("psi"),
        F.max("__cdf_gap").alias("cdf_linf"),
    )
    return out.where(
        (F.col("count_prev") > 0) & (F.col("count_cur") > 0)
    ).select(
        F.col("__day").alias("day"),
        *keys,
        F.lit(column).alias("column_name"),
        "count_cur",
        "count_prev",
        "psi",
        "cdf_linf",
    )


def profile_diff(
    profile_a: DataFrame,
    profile_b: DataFrame,
    keys: Sequence[str] = ("column_name",),
) -> DataFrame:
    """Column-level diff of two finalized profiles — drift straight from
    the PROFILE STORE, no raw-data pass.

    Inputs are long-format finalized profiles (the output of
    ``operators/profile.profile`` / ``finalize_profile``, or a stored
    profile parquet read back): one row per (keys...) carrying count /
    null_count / inferred_type / numeric stats. Output per key:

      count_a, count_b, count_ratio (b/a), null_rate_a/b/_delta,
      type_changed + inferred_type_a/b, mean_a/b/_delta, stddev_delta,
      min_delta, max_delta

    Numeric deltas are NULL for columns without numeric stats (strings).
    Columns present in only one profile keep the other side's metrics
    NULL — schema drift (new/dropped columns) is visible as such rows.
    Profiles are O(columns) rows, so this join is driver-trivial at any
    data scale; the heavy lifting already happened when the profiles
    were built.
    """
    ks = list(keys)
    a = profile_a.select(
        *ks,
        F.col("count").alias("count_a"),
        F.col("null_count").alias("nulls_a"),
        F.col("inferred_type").alias("inferred_type_a"),
        F.col("mean").alias("mean_a"),
        F.col("stddev").alias("stddev_a"),
        F.col("min").alias("min_a"),
        F.col("max").alias("max_a"),
    )
    b = profile_b.select(
        *ks,
        F.col("count").alias("count_b"),
        F.col("null_count").alias("nulls_b"),
        F.col("inferred_type").alias("inferred_type_b"),
        F.col("mean").alias("mean_b"),
        F.col("stddev").alias("stddev_b"),
        F.col("min").alias("min_b"),
        F.col("max").alias("max_b"),
    )
    j = a.join(b, on=ks, how="full")
    nr_a = F.try_divide(F.col("nulls_a"), F.col("count_a"))
    nr_b = F.try_divide(F.col("nulls_b"), F.col("count_b"))
    return j.select(
        *ks,
        F.col("count_a"),
        F.col("count_b"),
        F.try_divide(F.col("count_b"), F.col("count_a")).alias("count_ratio"),
        nr_a.alias("null_rate_a"),
        nr_b.alias("null_rate_b"),
        (nr_b - nr_a).alias("null_rate_delta"),
        (
            F.col("inferred_type_a").isNotNull()
            & F.col("inferred_type_b").isNotNull()
            & (F.col("inferred_type_a") != F.col("inferred_type_b"))
        ).alias("type_changed"),
        F.col("inferred_type_a"),
        F.col("inferred_type_b"),
        F.col("mean_a"),
        F.col("mean_b"),
        (F.col("mean_b") - F.col("mean_a")).alias("mean_delta"),
        (F.col("stddev_b") - F.col("stddev_a")).alias("stddev_delta"),
        (F.col("min_b") - F.col("min_a")).alias("min_delta"),
        (F.col("max_b") - F.col("max_a")).alias("max_delta"),
    )


def auto_splits(
    df_a: DataFrame, df_b: DataFrame, column: str, bins: int = 10
) -> list[float]:
    """Equal-width interior edges over the COMBINED slices' [min, max].

    One tiny aggregate per slice (a scalar row — the histogram
    two-pass shape); the returned edges feed ``numeric_drift`` so both
    slices bin identically.
    """
    v = F.col(column).cast("double")
    ok = _valid_value(v)
    lo_hi = (
        df_a.select(v.alias("v")).where(ok)
        .unionAll(df_b.select(v.alias("v")).where(ok))
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .first()
    )
    lo, hi = lo_hi["lo"], lo_hi["hi"]
    if lo is None or hi is None or not math.isfinite(hi - lo) or hi <= lo:
        return []
    width = (hi - lo) / bins
    return [lo + i * width for i in range(1, bins)]
