"""Profile-store anomaly monitoring — trailing-window z-scores over a
metric time series, the stddev monitor a whylogs consumer runs against
its stored daily profiles.

Input is a long-format profile STORE slice: one row per (time bucket,
keys…) carrying finalized metrics (the output of
``operators/profile.profile`` with a ``time_column``, or a store
read-back). Each row's metric is compared against the trailing
``window`` buckets of the SAME key (current bucket excluded): flag when
|x − trailing_mean| > z · trailing_std.

Engine-determinism: the trailing mean/std come from EXACT integer sums
(``floor(x·1e6 + 0.5)`` BIGINT — profile metrics are already rounded to
6 decimals, so the scaling is lossless), making the windowed moments
shuffle- and frame-order-independent, hence DuckDB-oracle-checkable.
The whole computation is window functions over the aggregate-sized
store (O(buckets × keys) rows) — monitoring a year of 100 TB days
costs reading 365 profile rows per column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
    # Exact sum-of-squares without decimal window sums (decimal SUM over
    # sliding frames is ~1.6x slower end-to-end): split xi = hi*2^30 + lo
    # (arithmetic shift — exact for negatives in two's complement), so
    # xi^2 = hi^2*2^60 + hi*lo*2^31 + lo^2 and three LONG window sums
    # carry the square exactly. Every per-row term and each frame sum
    # stays under 2^63 for |metric| <= ~1.2e12 at window<=7 (bound
    # scales as 1/sqrt(window)); beyond that the ANSI overflow throws
    # loudly — same failure mode (at a 3x lower bound) as the previous
    # decimal(38,0) path, which overflowed past |metric|~3.8e12.
    hi = F.shiftright(xi, 30)
    lo = xi.bitwiseAND(F.lit((1 << 30) - 1))
    n = F.count(xi).over(w)
    s = F.sum(xi).over(w)
    s2 = (
        F.sum(hi * hi).over(w).cast("double") * F.lit(float(1 << 60))
        + F.sum(hi * lo).over(w).cast("double") * F.lit(float(1 << 31))
        + F.sum(lo * lo).over(w).cast("double")
    )
    # exact-int sums -> deterministic double recombination; var via
    # E[x^2] - E[x]^2 on the scaled ints, descaled once (the DuckDB
    # oracle recombines the identical three sums with the identical
    # IEEE expression, so values hash-match bit-for-bit)
    mean = s / n / F.lit(float(INT_SCALE))
    var = (
        (s2 / n) - (s / n) * (s / n)
    ) / F.lit(float(INT_SCALE) * float(INT_SCALE))
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
