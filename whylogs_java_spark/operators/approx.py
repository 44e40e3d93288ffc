"""Approximate (sketch) tier — the 100 TB scale path.

The reference's accuracy/footprint tradeoffs come from Apache DataSketches
(core/build.gradle.kts:41): KllFloatsSketch(k=256) for quantiles
(NumberTracker.java:38), Theta unions for unique counts
(ThetaSketch.java:12-21), HllSketch(lgK=12) for text cardinality
(ColumnProfile.java:39). Spark 4 ships the same DataSketches algorithms as
native aggregates — so this tier is *algorithm-identical* to the
reference, not merely comparable:

- ``kll_sketch_agg_float(col, 256)``  ≙ KllFloatsSketch(256) updates
- ``theta_sketch_agg``                ≙ theta Union
- ``hll_sketch_agg(col, 12)``         ≙ HllSketch(lgK=12)

Sketch binaries are mergeable with kll_sketch_merge / theta_union_agg /
hll_union_agg — the same union algebra the reference uses for profile
merge, but Catalyst-native (fixed-size buffers, partial+final agg, no
Java-serialized blobs).

Estimates are approximate by construction: the driver records rows-only
checks for these queries; exactness is covered by the exact tier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import HLL_LGK, KLL_K, SUMMARY_QUANTILES
from ..functions.predicates import masked, truncated_text


def sketch_profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Mergeable sketch atoms: one row per group, sketch binaries per column.

    Numeric columns get a KLL(256) quantile sketch + theta distinct sketch;
    every column gets an HLL(lgK=12) sketch over its 256-char-truncated
    string form (ColumnProfile.trackText semantics).
    """
    keys = list(group_by)
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = [c for c in (columns or df.columns) if c not in set(keys)]
    aggs = []
    for c in cols:
        dt = schema[c]
        m = masked(F.col(c), dt)
        if dt.typeName() in ("double", "float", "long", "integer", "short", "byte"):
            aggs.append(
                F.kll_sketch_agg_float(m.cast("float"), F.lit(KLL_K)).alias(f"{c}__kll")
            )
            aggs.append(F.theta_sketch_agg(m.cast("double")).alias(f"{c}__theta"))
        aggs.append(
            F.hll_sketch_agg(truncated_text(F.col(c)), F.lit(HLL_LGK)).alias(f"{c}__hll")
        )
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    return grouped.agg(*aggs)


def merge_sketch_profiles(sketches: DataFrame, group_by: Sequence[str] = ()) -> DataFrame:
    """Union sketch atoms down to coarser groups (profile merge, approx tier)."""
    keys = list(group_by)
    aggs = []
    for f in sketches.schema.fields:
        if f.name in keys:
            continue
        if f.name.endswith("__kll"):
            aggs.append(F.kll_merge_agg_float(f.name).alias(f.name))
        elif f.name.endswith("__theta"):
            aggs.append(F.theta_union_agg(f.name).alias(f.name))
        elif f.name.endswith("__hll"):
            aggs.append(F.hll_union_agg(f.name).alias(f.name))
    grouped = sketches.groupBy(*keys) if keys else sketches.groupBy()
    return grouped.agg(*aggs)


def sketch_summary(
    sketches: DataFrame,
    group_by: Sequence[str] = (),
    quantiles: Sequence[float] = tuple(SUMMARY_QUANTILES),
) -> DataFrame:
    """Finalize sketch atoms into estimates, long format.

    Output: (keys..., column_name, unique_theta, unique_hll,
    q_0 .. q_1 as quantile array).
    """
    keys = list(group_by)
    cols = sorted(
        {
            f.name.rsplit("__", 1)[0]
            for f in sketches.schema.fields
            if "__" in f.name
        }
    )
    structs = []
    field_names = {f.name for f in sketches.schema.fields}
    for c in cols:
        parts = [F.lit(c).alias("column_name")]
        parts.append(
            (
                F.theta_sketch_estimate(F.col(f"{c}__theta"))
                if f"{c}__theta" in field_names
                else F.lit(None).cast("double")
            ).alias("unique_theta")
        )
        parts.append(
            (
                F.hll_sketch_estimate(F.col(f"{c}__hll"))
                if f"{c}__hll" in field_names
                else F.lit(None).cast("long")
            ).cast("double").alias("unique_hll")
        )
        parts.append(
            (
                F.array(
                    *[
                        F.kll_sketch_get_quantile_float(
                            F.col(f"{c}__kll"), F.lit(float(q))
                        )
                        for q in quantiles
                    ]
                )
                if f"{c}__kll" in field_names
                else F.lit(None).cast("array<float>")
            ).alias("quantiles")
        )
        structs.append(F.struct(*parts))
    return sketches.select(*keys, F.explode(F.array(*structs)).alias("m")).select(
        *keys, "m.*"
    )


def approx_unique_counts(
    df: DataFrame, columns: Sequence[str], group_by: Sequence[str] = ()
) -> DataFrame:
    """HLL++ distinct estimates (long format) — one pass, no expand, the
    default cardinality path at scale (vs exact count_distinct)."""
    keys = list(group_by)
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    wide = grouped.agg(
        *[F.approx_count_distinct(c, 0.01).alias(f"{c}__u") for c in columns]
    )
    elems = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"{c}__u").cast("long").alias("unique_count"),
        )
        for c in columns
    ]
    return wide.select(*keys, F.explode(F.array(*elems)).alias("e")).select(*keys, "e.*")
