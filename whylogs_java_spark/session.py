"""SparkSession factory tuned for the profiling engine.

Local testing runs on local[N]; the same settings are what we'd ship as
defaults on a real cluster (AQE on, partition coalescing, Arrow for the
few Pandas-UDF paths). Nothing here is local-mode specific except the
master default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "whylogs_java_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores events.ts as TIMESTAMP(NANOS); read as long
        # and convert in sources.parquet.load_table
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # profile plans carry ~30 aggregate columns per profiled source
        # column; the default maxFields=100 silently disables whole-stage
        # codegen for them (measured 3x slowdown on the sf0.1 flagship)
        .config("spark.sql.codegen.maxFields", "2000")
        # wide profile aggregations generate >8KB update methods; HotSpot
        # refuses to JIT those by default (DontCompileHugeMethods) and runs
        # them interpreted — measured 5x slowdown on the sf0.1 flagship.
        # Local mode: driver == executor, so the driver flag covers tasks.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:MaxInlineLevel=18",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:MaxInlineLevel=18",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
