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
    return spark.read.parquet(path)


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
