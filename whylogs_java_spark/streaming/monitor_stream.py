"""Streaming anomaly monitor — the streaming face of
``operators/monitor.metric_anomalies``.

The batch monitor reads a finalized profile STORE (one row per time
bucket x key) and flags trailing-window z-score anomalies. Live, the
same loop is: (1) the stream reduces raw events to finalized store rows
— ONE stateful windowed aggregation, append mode, so a bucket row emits
exactly once when the watermark passes it; (2) each micro-batch appends
its finalized buckets to the store sink and re-scores the accumulated
store with the batch ``metric_anomalies`` — the store is aggregate-sized
(O(buckets x keys)), so re-scoring it per micro-batch costs a window
function over profile rows, never a second pass over data.

This composition (stateful reduction in the stream, profile-sized logic
in ``foreachBatch``) is the package's standard streaming shape
(`drift_stream.py`, `wire_sink.py`): Structured Streaming allows one
stateful aggregation per query, and everything downstream of the store
is bounded.

State: the windowed aggregate's state per (window, keys) group is one
exact-integer sum + count, watermark-expired. The store sink grows by
O(keys) rows per bucket — the same footprint the batch monitor reads.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.monitor import INT_SCALE, metric_anomalies

__all__ = ["windowed_metric_stream", "monitor_foreach_batch"]


def windowed_metric_stream(
    stream_df: DataFrame,
    value_col: str,
    time_col: str,
    group_by: Sequence[str] = (),
    window_duration: str = "1 hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Per-(window, keys) finalized metric rows: (bucket, keys…, n, value).

    ``value`` is the bucket mean via the exact-integer atom convention
    (floor(x·1e6 + 0.5) summed as BIGINT, descaled and rounded to 6) —
    shuffle-order-independent, so the streamed store rows are
    bit-identical to a batch aggregation over the same events, which is
    what makes the stream-vs-batch equivalence testable and the
    downstream z-scores engine-deterministic. Works on a batch frame
    too (watermark is applied only when the input is streaming), so the
    batch twin of the store IS this same function.
    """
    x = F.col(value_col).cast("double")
    xi = F.floor(x * INT_SCALE + F.lit(0.5)).cast("long")
    src = (
        stream_df.withWatermark(time_col, watermark)
        if stream_df.isStreaming
        else stream_df
    )
    agg = (
        src.groupBy(
            F.window(F.col(time_col), window_duration).alias("window"),
            *group_by,
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xi).alias("__s"),
        )
    )
    value = F.round(
        F.col("__s") / F.col("n") / F.lit(float(INT_SCALE)), 6
    ) + F.lit(0.0)
    return agg.select(
        F.col("window.start").alias("bucket"),
        *group_by,
        F.col("n"),
        value.alias("value"),
    )


def monitor_foreach_batch(
    store_dir: str,
    anomalies_dir: str,
    keys: Sequence[str] = (),
    window: int = 7,
    z: float = 3.0,
    min_obs: int = 3,
):
    """``foreachBatch`` callable: append finalized buckets to the store,
    re-score the WHOLE accumulated store, overwrite the anomalies sink.

    The store parquet is the same long-format slice the batch monitor
    consumes, so a consumer can point ``metric_anomalies`` (or the CLI
    ``monitor`` subcommand) at ``store_dir`` at any time and get the
    identical verdicts the stream just wrote to ``anomalies_dir``.
    """

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.head(1):
            return
        batch_df.write.mode("append").parquet(store_dir)
        spark = batch_df.sparkSession
        store = spark.read.parquet(store_dir)
        out = metric_anomalies(
            store,
            metric="value",
            time_col="bucket",
            keys=tuple(keys),
            window=window,
            z=z,
            min_obs=min_obs,
        )
        out.write.mode("overwrite").parquet(anomalies_dir)

    return _fn
