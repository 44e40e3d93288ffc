"""whylogs_java_spark — a PySpark-native statistical profiling engine.

A from-scratch rebuild of the capabilities of whylabs/whylogs-java
(reference read-only at /root/reference) on idiomatic Spark: every tracker
is a set of built-in Catalyst aggregate expressions, a dataset profile is a
DataFrame, and merge is union + re-aggregation of exact mergeable atoms.
"""

from .operators.profile import (
    finalize_profile,
    merge_profile_atoms,
    profile,
    profile_atoms,
)
from .session import get_spark

__all__ = [
    "profile",
    "profile_atoms",
    "finalize_profile",
    "merge_profile_atoms",
    "get_spark",
    # subpackages provide: operators.{summary,model,segmentation,dedup,
    # similarity,text,charpos,approx,multimodal}, plans.session_api,
    # sources.{csv,parquet,sinks}, streaming.profile_stream
]
