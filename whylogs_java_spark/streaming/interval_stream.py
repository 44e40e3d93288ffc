"""Streaming point-in-interval enrichment — the streaming face of
``operators/joins.range_join_points``.

A stream of points (events carrying a numeric position: a timestamp
epoch, an offset, a price) is annotated with the STATIC intervals that
contain each point (rate bands, maintenance windows, config epochs).

Structured Streaming supports stateless stream-static equi-joins
natively, so no ``foreachBatch`` escape hatch is needed: the interval
table explodes ONCE (query definition time) to the fixed-width buckets
each interval spans, the stream side maps each point to its single
bucket, and the join is a broadcast hash equi-join on (keys…, bucket)
with the exact containment predicate folded into the join condition —
no state store, no watermark, each micro-batch enriched independently.

Scale shape: the exploded interval side is broadcast (interval tables
are dimension-sized; the explode factor is interval length /
``bucket_width``). The stream side is scan-shaped — zero shuffles. A
point's bucket equals exactly one of an interval's exploded buckets, so
a (point, interval) pair can never duplicate (the same ownership
argument as the batch operator, joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import (
    containment_predicate,
    interval_buckets,
    point_bucket,
)


def interval_enrich_stream(
    stream_points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | None = None,
    bucket_width: float = 1.0,
    closed: str = "left",
    how: str = "inner",
) -> DataFrame:
    """Stream rows + every containing interval's columns.

    ``how="inner"`` drops uncovered points; ``how="left"`` keeps them
    with NULL interval columns (the containment predicate lives in the
    JOIN CONDITION, not a post-filter, so a bucket-collision that fails
    exact containment NULLs out instead of dropping the row). A point
    inside k overlapping intervals emits k rows — same contract as the
    batch operator. Column names must not collide; alias beforehand.

    ``closed``/``bucket_width``/``on`` as in ``range_join_points``;
    positions are numeric (cast timestamps to epoch seconds upstream).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    on = on or []
    if float(bucket_width) <= 0:
        raise ValueError("bucket_width must be positive")

    p = stream_points.withColumn("__bucket", point_bucket(point_col, bucket_width))
    i = F.broadcast(
        intervals.withColumn(
            "__bucket", F.explode(interval_buckets(lo_col, hi_col, bucket_width))
        )
    )
    # rename the static side's bucket/keys so the condition can
    # reference both sides without ambiguity; plain == keeps every
    # clause equi-extractable for the hash join (and NULL keys/buckets
    # match nothing, the SQL join contract)
    i = i.withColumnRenamed("__bucket", "__ibucket")
    cond = containment_predicate(point_col, lo_col, hi_col, closed) & (
        F.col("__bucket") == F.col("__ibucket")
    )
    for k in on:
        i = i.withColumnRenamed(k, f"__ik_{k}")
        cond = cond & (F.col(k) == F.col(f"__ik_{k}"))
    joined = p.join(i, on=cond, how="left_outer" if how == "left" else "inner")
    drop = ["__bucket", "__ibucket"] + [f"__ik_{k}" for k in on]
    return joined.drop(*drop)
