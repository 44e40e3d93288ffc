"""Profile-store anomaly monitoring — trailing-window z-scores over a
metric time series, the stddev monitor a whylogs consumer runs against
its stored daily profiles.

Input is a long-format profile STORE slice: one row per (time bucket,
keys…) carrying finalized metrics (the output of
``operators/profile.profile`` with a ``time_column``, or a store
read-back). Each row's metric is compared against the trailing
``window`` buckets of the SAME key (current bucket excluded): flag when
|x − trailing_mean| > z · trailing_std.

Engine-determinism: metrics scale to exact integers
(``floor(x·1e6 + 0.5)`` BIGINT — profile metrics are already rounded to
6 decimals, so the scaling is lossless); the trailing mean AND variance
come from SHIFTED moments over the collected frame (pivot = frame min,
an exact long; deviations are exact longs; squares and the fixed
left-fold sums run in double) — deterministic at EVERY metric
magnitude, because double ops are exact functions of (values, order)
and both engines replay the identical fold. The r12 magnitude audit replaced the former
raw-moment recombination ``E[x²]−E[x]²`` here: its double ulp scales
with x², so an epoch-millis-magnitude metric (~1e12, within the
documented domain bound) drowned any deviation under ~350 in
recombination noise — the same catastrophic-cancellation family as the
profile variance fix (metrics.py variance-tier note).
The whole computation is window functions over the aggregate-sized
store (O(buckets × keys) rows) — monitoring a year of 100 TB days
costs reading 365 profile rows per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hof import let_bound

INT_SCALE = 1_000_000


def metric_anomalies(
    store: DataFrame,
    metric: str,
    time_col: str,
    keys: Sequence[str] = ("column_name",),
    window: int = 7,
    z: float = 3.0,
    min_obs: int = 3,
) -> DataFrame:
    """Trailing-window z-score per (keys…, time bucket).

    Output: (time_col, keys…, value, trailing_n, trailing_mean,
    trailing_std, zscore, is_anomaly). Buckets with fewer than
    ``min_obs`` trailing observations report NULL zscore and FALSE
    is_anomaly (not enough history to judge). A zero trailing std
    yields NULL zscore; any deviation from the constant history still
    flags (|x − mean| > 0 = z·0).
    """
    ks = list(keys)
    # metric as a secondary sort key: a store slice should hold ONE row
    # per (keys, bucket), but if duplicates sneak in the trailing frame
    # stays deterministic instead of partition-order-dependent
    w = (
        Window.partitionBy(*ks)
        .orderBy(F.col(time_col).asc(), F.col(metric).asc_nulls_first())
        .rowsBetween(-window, -1)
    )
    x = F.col(metric).cast("double")
    xi = F.floor(x * INT_SCALE + F.lit(0.5)).cast("long")
    n = F.count(xi).over(w)
    # Shifted trailing moments (r12 — see the module docstring): the
    # frame is at most ``window`` rows, so collect it and compute BOTH
    # Σ(xi−min) and Σ(xi−min)² in the array world. Pivot and deviations
    # are exact longs; squares and the left-fold sums are double with
    # error relative to the DEVIATIONS, never to the metric magnitude.
    # No windowed Σxi anywhere, so the former frame-sum overflow bound
    # (|metric| <= ~1.2e12 at window=7) widens to the xi cast itself
    # (|metric| <= ~9.2e12, ANSI-loud beyond). Fold order is fixed, so
    # the DuckDB oracle's identical list_reduce replay hash-matches
    # bit-for-bit at every magnitude.
    arr = F.collect_list(xi).over(w)

    def _shifted_stats(a: Column) -> Column:
        def _with_pivot(m: Column) -> Column:
            def _folds(dev: Column) -> Column:
                nn = F.size(dev).cast("double")
                sd = F.aggregate(dev, F.lit(0.0), lambda acc, e: acc + e)
                sd2 = F.aggregate(
                    dev, F.lit(0.0), lambda acc, e: acc + e * e
                )
                # empty frame (first rows of a partition when min_obs
                # allows it): NULL stats, matching the pre-r12 windowed
                # F.sum semantics — under ANSI, 0.0/0.0 would throw
                return F.when(
                    nn > 0,
                    F.struct(
                        ((m.cast("double") + sd / nn) / F.lit(float(INT_SCALE))).alias(
                            "mean"
                        ),
                        (
                            (sd2 / nn - (sd / nn) * (sd / nn))
                            / F.lit(float(INT_SCALE) * float(INT_SCALE))
                        ).alias("var"),
                    ),
                )

            return let_bound(
                F.transform(a, lambda e: (e - m).cast("double")), _folds
            )

        return let_bound(F.array_min(a), _with_pivot)

    stats = let_bound(arr, _shifted_stats)
    mean = stats["mean"]
    var = stats["var"]
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    enough = n >= F.lit(int(min_obs))
    dev = F.abs(x - mean)
    zscore = F.try_divide(dev, std)
    flagged = enough & x.isNotNull() & (dev > F.lit(float(z)) * std)
    return store.select(
        F.col(time_col),
        *ks,
        (F.round(x, 6) + F.lit(0.0)).alias("value"),
        n.alias("trailing_n"),
        F.when(enough, F.round(mean, 6) + F.lit(0.0)).alias("trailing_mean"),
        F.when(enough, F.round(std, 6) + F.lit(0.0)).alias("trailing_std"),
        F.when(enough, F.round(zscore, 6) + F.lit(0.0)).alias("zscore"),
        F.coalesce(F.when(enough, flagged), F.lit(False)).alias("is_anomaly"),
    )
