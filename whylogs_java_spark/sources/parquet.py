"""Parquet scans with schema normalization.

The driver's ``events`` table stores ``ts`` as parquet TIMESTAMP(NANOS),
which Spark refuses to read natively (PARQUET_TYPE_ILLEGAL). With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.get_spark)
nano timestamps load as LongType nanoseconds; ``load_table`` converts them
back to TimestampType (microsecond precision — Spark's native resolution).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# columns known to be nano-precision timestamps in the driver testdata
NANO_TS_COLUMNS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in NANO_TS_COLUMNS.get(name, []):
        if c not in df.columns:
            continue
        if isinstance(df.schema[c].dataType, T.LongType):
            # integer division: double division would lose precision on
            # epoch-nano magnitudes (~1.7e18 > 2^53)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(df.schema[c].dataType, T.TimestampNTZType):
            # newer testdata stores micro-precision TIMESTAMP (read as NTZ):
            # cast to session-TZ TimestampType (the session pins UTC, so the
            # wall-clock is unchanged) so downstream unix_micros/date_trunc
            # behave identically to the legacy nanos-as-long path
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
