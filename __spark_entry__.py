"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from whylogs_java_spark import (
    finalize_profile,
    merge_profile_atoms,
    profile,
    profile_atoms,
)
from whylogs_java_spark.plans.oracle import profile_oracle_sql
from whylogs_java_spark.sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # the driver may hand us a session without our configs; make nano
    # timestamps readable before any parquet scan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full mixed-type dataset profile of lineitem by return flag."""
    df = _t(spark, "/root/testdata/sf0.001", "lineitem")
    return profile(df, group_by=["l_returnflag"])


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(_t(spark, sf_dir, "lineitem"), group_by=["l_returnflag"])


def q_profile_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile(
        _t(spark, sf_dir, "events"),
        group_by=["event_type"],
        time_column="ts",
        time_granularity="day",
    )


def q_profile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeability invariant: profile(half A) ⊕ profile(half B) == profile(all).

    Exercises DatasetProfile.merge semantics (DatasetProfile.java:251-300):
    atoms from two disjoint halves union + re-aggregate into the whole-table
    profile; the oracle profiles the whole table directly.
    """
    li = _t(spark, sf_dir, "lineitem")
    keys = ["l_returnflag"]
    a = profile_atoms(li.filter("l_orderkey % 2 = 0"), group_by=keys)
    b = profile_atoms(li.filter("l_orderkey % 2 = 1"), group_by=keys)
    merged = merge_profile_atoms(a.unionByName(b), keys)
    return finalize_profile(merged, keys)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "profile_lineitem": q_profile_lineitem,
        "profile_events_daily": q_profile_events_daily,
        "profile_merge": q_profile_merge,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "profile_lineitem": profile_oracle_sql("lineitem", group_by=["l_returnflag"]),
        "profile_events_daily": profile_oracle_sql(
            "events", group_by=["event_type"], time_column="ts", time_granularity="day"
        ),
        "profile_merge": profile_oracle_sql("lineitem", group_by=["l_returnflag"]),
    }
