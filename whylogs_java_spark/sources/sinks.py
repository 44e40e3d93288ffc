"""Profile sinks: Parquet (atoms, re-mergeable) and JSON summaries.

Reference parity:
- Parquet profile sink/scan: profile.py:100-108 (aggParquet),
  WhyLogsTest.scala:52. Stored atoms re-merge losslessly (the engine's
  equivalent of the protobuf binary round trip,
  DatasetProfile.java:316-368) — counts/sums/extremes are exact atoms, so
  write -> read -> merge == merge in memory.
- JSON summary sink: Profiler.java:150-168 / ProfileViewer.java:78-97 —
  the finalized per-column summary view serialized one JSON object per
  (group, column) row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import finalize_profile, merge_profile_atoms


def write_profile_atoms(atoms: DataFrame, path: str, mode: str = "overwrite") -> None:
    atoms.write.mode(mode).parquet(path)


def read_profile_atoms(spark: SparkSession, path: str) -> DataFrame:
    """Read a stored atom profile, backfilling schema evolution.

    Stores written before the r12 ``_m2`` atoms (the stable variance
    tier, metrics.py) lack the three m2 columns; backfill each from the
    row's own raw moments — exactly the estimate the legacy finalize
    computed, so a legacy store keeps its legacy variance quality
    (exact below 2³¹/value, the known cancellation above) while gaining
    mergeability with fresh atoms."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    for s in ("num", "len", "tok"):
        if f"{s}_m2" in df.columns:
            continue
        n = F.col(f"{s}_n")
        sx = (
            F.col(f"{s}_sum_hi").cast("double")
            + F.col(f"{s}_sum_lo").cast("double") / 1000000.0
            + F.col(f"{s}_sum_big")
        )
        sx2 = (
            F.col(f"{s}_sum2_a").cast("double") * 2147483648.0
            + F.col(f"{s}_sum2_b").cast("double")
            + F.col(f"{s}_sum2_lo").cast("double") / 1000000.0
            + F.col(f"{s}_sum2_big")
        )
        df = df.withColumn(
            f"{s}_m2",
            F.when(n > 1, F.greatest(sx2 - sx * sx / n, F.lit(0.0))).when(
                n >= 1, F.lit(0.0)
            ),
        )
    return df


def merge_stored_profiles(
    spark: SparkSession, paths: Sequence[str], key_names: Sequence[str]
) -> DataFrame:
    """Union stored atom profiles and re-merge — DatasetProfileMerger
    (DatasetProfileMerger.scala:13-38) over Parquet instead of blobs."""
    dfs = [read_profile_atoms(spark, p) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return merge_profile_atoms(out, key_names)


def write_profile_summary_json(
    atoms: DataFrame, key_names: Sequence[str], path: str, mode: str = "overwrite"
) -> None:
    """Finalized summary as JSON lines (one object per group x column)."""
    finalize_profile(atoms, key_names).write.mode(mode).json(path)
