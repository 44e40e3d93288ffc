"""CSV ingestion with the reference CLI's datetime-parsing semantics.

Reference: cli/.../Profiler.java:44-45,117-145 (header CSV, configurable
delimiter, "" -> null) and core/.../datetime/EasyDateTimeParser.java +
DateTimeFormatParser.java (nine supported shapes incl. epoch/epochMillis;
null-ish inputs "nan"/"null"/"" -> epoch 0).

Spark-first: the scan is ``spark.read.csv`` (header, nullValue "",
pushdown-friendly); the datetime column is parsed with built-in
``to_timestamp``-family expressions — per-partition streaming parse, no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_SECONDS_FORMAT = "epoch"
EPOCH_MILLIS_FORMAT = "epochMillis"

# Java DateTimeFormatter field classes -> parse strategy, mirroring
# EasyDateTimeParser.calculateFormat (EasyDateTimeParser.java:45-84).
# Spark uses the same pattern letters as java.time for the common shapes.
_NULLISH = ("nan", "null", "")


def parse_datetime(col: Column, fmt: str) -> Column:
    """EasyDateTimeParser.parse as a Column expression.

    - 'epoch' / 'epochMillis' -> integer seconds/millis
      (DateTimeFormatParser.java:101-121)
    - patterns with date+time -> to_timestamp(fmt)
    - date-only patterns -> to_date + midnight UTC
      (DateTimeFormatParser.java:79-84)
    - partial dates (MM-dd, yyyy-MM, yyyy) -> completed to day 1 / Jan 1 /
      current year (DateTimeFormatParser.java:66-97) via format widening
    - null-ish ("nan"/"null"/"", case-insensitive) -> epoch 0
      (EasyDateTimeParser.java:30-37)
    """
    lc = F.lower(F.trim(col))
    nullish = lc.isNull() | lc.isin(*_NULLISH)
    parsed = _parse_by_format(col, fmt)
    return F.when(nullish, F.timestamp_seconds(F.lit(0))).otherwise(parsed)


def _parse_by_format(col: Column, fmt: str) -> Column:
    if fmt.lower() == EPOCH_SECONDS_FORMAT.lower():
        return F.timestamp_seconds(col.cast("long"))
    if fmt.lower() == EPOCH_MILLIS_FORMAT.lower():
        return F.timestamp_millis(col.cast("long"))

    has_year = "y" in fmt or "u" in fmt
    has_month = "M" in fmt
    has_day = "d" in fmt
    has_hour = "H" in fmt or "h" in fmt

    if has_hour:
        # zoned or local datetime (local interpreted as UTC — session TZ
        # must be UTC, matching LOCAL_DATETIME's atZone(UTC))
        if has_year and has_month and has_day:
            return F.to_timestamp(col, fmt)
        # time-only: today's date at that time (LOCAL_TIME semantics)
        return F.to_timestamp(
            F.concat(F.date_format(F.current_date(), "yyyy-MM-dd"), F.lit(" "), col),
            f"yyyy-MM-dd {fmt}",
        )
    if has_year and has_month and has_day:
        return F.to_date(col, fmt).cast("timestamp")
    if not has_year and has_month and has_day:
        # MonthDay at current year (DateTimeFormatParser.java:66-72)
        return F.to_date(
            F.concat(F.date_format(F.current_date(), "yyyy"), F.lit("-"), col),
            f"yyyy-{fmt}",
        ).cast("timestamp")
    if has_year and has_month:
        return F.to_date(F.concat(col, F.lit("-01")), f"{fmt}-dd").cast("timestamp")
    if has_year:
        return F.to_date(F.concat(col, F.lit("-01-01")), f"{fmt}-MM-dd").cast("timestamp")
    raise ValueError(f"unsupported datetime format shape: {fmt}")


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    datetime_column: str | None = None,
    datetime_format: str | None = None,
    limit: int | None = None,
) -> DataFrame:
    """CLI-equivalent CSV scan: header-aware, ""->null, optional row limit
    (Profiler.java:131-135) and datetime column parsing."""
    df = (
        spark.read.option("header", True)
        .option("sep", delimiter)
        .option("nullValue", "")
        .csv(path)
    )
    if limit is not None:
        df = df.limit(limit)
    if datetime_column and datetime_format:
        df = df.withColumn(
            datetime_column, parse_datetime(F.col(datetime_column), datetime_format)
        )
    return df
