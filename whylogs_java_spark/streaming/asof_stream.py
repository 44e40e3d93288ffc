"""Streaming as-of enrichment against a static dimension.

The streaming face of ``operators/joins.asof_join``: each stream row is
annotated with the latest at-or-before row of a STATIC right table (a
slowly-changing dimension: price books, model versions, config
history). Structured Streaming cannot run the batch operator's window
over an unbounded stream, and a stream-static join cannot express the
"latest at-or-before" predicate as an equi-join — so this is the
sanctioned Python escape hatch: the dimension is collected once, sorted,
broadcast, and each Arrow batch is enriched with pandas ``merge_asof``
inside ``mapInPandas``.

Scale shape: the dimension must fit in executor memory (it is a
broadcast — the same constraint as any broadcast dim join; ~10^7 rows
is comfortable). The stream side is scan-shaped: no shuffle, no state,
no watermark — every micro-batch is enriched independently, so the
operator composes with any downstream windowing. For a dimension too
big to broadcast, run the batch ``asof_join`` per micro-batch in
``foreachBatch`` instead (it shuffles both sides on the key each
batch, but has no memory bound).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for callers)
from pyspark.sql.types import StructField, StructType


def asof_enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_r",
    max_dim_rows: int = 10_000_000,
) -> DataFrame:
    """Stream rows + the dimension's latest at-or-before row per key.

    Backward direction only (the streaming case: enrich with the state
    that WAS current). Output schema: stream columns +
    ``<right_ts><suffix>`` + ``<col><suffix>`` per right column, NULL
    where no dimension row qualifies. NULL semantics match the batch
    operator: NULL-ts/NULL-key dimension rows never match; NULL-ts/
    NULL-key stream rows get NULL enrichment.

    ``dim_df`` is evaluated ONCE at stream definition time (collected to
    pandas, sorted, broadcast). A changed dimension needs a new query —
    by design: a streaming query's enrichment should be versioned, not
    silently drifting.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in dim_df.columns if c not in keys and c != rts]

    # Driver-size guard: the dimension is collected to the DRIVER and
    # broadcast — a fact-sized right side would OOM it silently. The
    # count is one cheap aggregate over a table that must be small
    # anyway for this operator to be the right choice.
    n_dim = dim_df.count()
    if n_dim > max_dim_rows:
        raise ValueError(
            f"asof_enrich_stream collects the dimension to the driver: "
            f"{n_dim} rows exceeds max_dim_rows={max_dim_rows}. For a "
            f"fact-sized right side run the batch operators.joins."
            f"asof_join per micro-batch in foreachBatch (unbounded, one "
            f"shuffle per batch), or raise max_dim_rows if the driver "
            f"really has the memory."
        )

    dim_pdf = (
        dim_df.select(*keys, rts, *right_cols)
        .where(F.col(rts).isNotNull())
        .toPandas()
    )
    for k in keys:
        dim_pdf = dim_pdf[dim_pdf[k].notna()]
    dim_pdf = dim_pdf.sort_values(rts, kind="mergesort").reset_index(drop=True)
    # rename right columns up front so merge_asof never collides with
    # stream column names
    ts_out = rts + suffix
    ren = {rts: ts_out, **{c: c + suffix for c in right_cols}}
    dim_pdf = dim_pdf.rename(columns=ren)
    out_cols = [ts_out] + [c + suffix for c in right_cols]

    spark = stream_df.sparkSession
    bc = spark.sparkContext.broadcast(dim_pdf)

    dim_schema = dim_df.select(rts, *right_cols).schema
    out_schema = StructType(
        list(stream_df.schema.fields)
        + [StructField(ren[f.name], f.dataType, True) for f in dim_schema.fields]
    )

    def enrich(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        def align(l: "pd.Series", r: "pd.Series"):
            # merge_asof demands identical key dtypes, but Arrow batches
            # and toPandas can disagree on width/nullability (int32 vs
            # float64-with-NaN). Align minimally: equal dtypes pass
            # through untouched; integer/integer widens to int64
            # (lossless — float64 would corrupt int64 ids/epochs above
            # 2^53); only a genuine int/float mix falls back to float64,
            # exact to 2^53 (nullable-int columns arrive as float64
            # already, so nothing further is lost).
            if l.dtype == r.dtype:
                return l, r
            if l.dtype.kind == "M" and r.dtype.kind == "M":
                # datetime64 with differing units (ns vs us — possible
                # between driver toPandas and Arrow mapInPandas batches)
                # or tz-awareness: normalize both to naive ns. A float64
                # fallback would raise in pandas 2 ("Cannot cast
                # DatetimeArray to dtype float64") and kill the query.
                def to_ns(s: "pd.Series") -> "pd.Series":
                    if getattr(s.dtype, "tz", None) is not None:
                        s = s.dt.tz_localize(None)
                    return s.astype("datetime64[ns]")

                return to_ns(l), to_ns(r)
            if l.dtype.kind in "iu" and r.dtype.kind in "iu":
                return l.astype("int64"), r.astype("int64")
            if "M" in (l.dtype.kind, r.dtype.kind):
                raise TypeError(
                    f"asof_enrich_stream: cannot align datetime column "
                    f"with non-datetime ({l.dtype} vs {r.dtype}) — the "
                    f"stream and dimension ts/key columns must both be "
                    f"timestamps or both numeric"
                )
            return l.astype("float64"), r.astype("float64")

        dim_base = bc.value
        dim_by = [f"__by{i}" for i in range(len(keys))]

        for pdf in batches:
            names = [f.name for f in out_schema.fields]
            if len(pdf) == 0:
                yield pdf.reindex(columns=names)
                continue
            ok = pdf[left_ts].notna()
            for k in keys:
                ok &= pdf[k].notna()
            good = pdf[ok].copy()
            dim = dim_base.copy()
            good["__lk"], dim["__rk"] = align(good[left_ts], dim[ts_out])
            for i, k in enumerate(keys):
                good[dim_by[i]], dim[dim_by[i]] = align(good[k], dim[k])
            dim = dim.drop(columns=keys)
            good = good.sort_values("__lk", kind="mergesort")
            tol = pd.Timedelta(seconds=tolerance) if (
                tolerance is not None
                and str(good["__lk"].dtype).startswith("datetime")
            ) else tolerance
            merged = pd.merge_asof(
                good,
                dim,
                left_on="__lk",
                right_on="__rk",
                by=dim_by,
                direction="backward",
                tolerance=tol,
                allow_exact_matches=True,
            )
            bad = pdf[~ok].copy()
            for c in out_cols:
                bad[c] = None
            out = pd.concat([merged[names], bad[names]], ignore_index=True)
            yield out

    return stream_df.mapInPandas(enrich, schema=out_schema)


# ---------------------------------------------------------------------------
# stream x stream as-of join
# ---------------------------------------------------------------------------

def asof_join_stream(
    left_stream: DataFrame,
    right_stream: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    tolerance: int | None = None,
    suffix: str = "_r",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream as-of join: each left row + the right stream's
    latest at-or-before row per key (backward direction — the streaming
    case: enrich with the state that WAS current).

    Completes the temporal family's streaming face: ``asof_enrich_stream``
    handles stream x STATIC, this handles stream x STREAM, and the batch
    twin is ``operators/joins.asof_join`` (backward) — the
    batch-equivalence contract pinned by
    ``test_asof_join_stream_matches_batch_any_boundaries``.

    Mechanics (the custom stateful pattern Structured Streaming's
    built-in stream-stream joins cannot express — their interval joins
    need a bounded range condition, not "latest at-or-before"):
    both sides are tagged and unioned, then ``applyInPandasWithState``
    keyed on the join key buffers rows per key:

    - a LEFT row becomes emittable only once the watermark passes its
      timestamp — at that point every admissible right row at-or-before
      it has arrived, so the match equals the batch join's;
    - the RIGHT buffer keeps rows above the watermark plus the single
      latest at-or-below it (the "current state" every future left row
      may still need); everything older is evicted;
    - an event-time timeout at the earliest pending left timestamp
      flushes keys the data stopped reaching, so every left row is
      emitted exactly once.

    State per key is O(rows inside the watermark horizon) + 1 — bounded
    by the watermark delay, not by history. Late rows beyond the
    watermark are dropped by Spark (the standard streaming contract;
    batch equivalence holds for data admitted by the watermark). Rows
    with NULL key or NULL timestamp are dropped on BOTH sides (the
    batch operator emits NULL-enriched left rows instead — documented
    deviation: a stateful streaming group cannot key on NULL).

    ``tolerance`` is in SECONDS (timestamps only — the watermark
    machinery requires event-time columns). Ties on (key, right_ts)
    resolve to the lexicographically-largest payload tuple, matching
    the batch operator's ``right_tiebreak`` on the first right column.

    Output: all left columns + ``<right_ts><suffix>`` +
    ``<col><suffix>`` per right column (NULL where nothing qualifies).
    """
    import pickle

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import StructField, StructType, TimestampType

    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right_stream.columns if c not in keys and c != rts]
    if not isinstance(left_stream.schema[left_ts].dataType, TimestampType):
        raise TypeError("asof_join_stream: left_ts must be a timestamp column")
    if not isinstance(right_stream.schema[rts].dataType, TimestampType):
        raise TypeError("asof_join_stream: right_ts must be a timestamp column")

    left_payload = [c for c in left_stream.columns if c not in keys and c != left_ts]
    ts_out = rts + suffix
    out_fields = (
        list(left_stream.schema.fields)
        + [StructField(ts_out, right_stream.schema[rts].dataType, True)]
        + [
            StructField(c + suffix, right_stream.schema[c].dataType, True)
            for c in right_cols
        ]
    )
    out_schema = StructType(out_fields)
    out_names = [f.name for f in out_schema.fields]

    # union schema: keys..., __ts, __side, left payload..., right payload
    # prefixed to dodge collisions
    l = (
        left_stream.withWatermark(left_ts, watermark)
        .where(F.col(left_ts).isNotNull())
        .select(
            *[F.col(k) for k in keys],
            F.col(left_ts).alias("__ts"),
            F.lit(0).alias("__side"),
            *[F.col(c) for c in left_payload],
            *[F.lit(None).cast(right_stream.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        )
    )
    r = (
        right_stream.withWatermark(rts, watermark)
        .where(F.col(rts).isNotNull())
        .select(
            *[F.col(k) for k in keys],
            F.col(rts).alias("__ts"),
            F.lit(1).alias("__side"),
            *[F.lit(None).cast(left_stream.schema[c].dataType).alias(c) for c in left_payload],
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        )
    )
    for k in keys:
        l = l.where(F.col(k).isNotNull())
        r = r.where(F.col(k).isNotNull())
    unioned = l.unionByName(r)

    tol_us = None if tolerance is None else int(tolerance) * 1_000_000
    n_keys = len(keys)
    n_left = len(left_payload)
    n_right = len(right_cols)

    def fn(key: tuple, pdfs, state: GroupState):
        from bisect import bisect_right

        left_buf: list = []   # (ts_us, (left payload...))
        right_buf: list = []  # (ts_us, (right payload...))
        if state.exists:
            left_buf, right_buf = pickle.loads(state.get[0])

        if not state.hasTimedOut:
            for pdf in pdfs:
                for row in pdf.itertuples(index=False):
                    t = row[n_keys]
                    if pd.isna(t):
                        continue
                    ts_us = int(pd.Timestamp(t).value // 1000)
                    side = row[n_keys + 1]
                    if side == 0:
                        left_buf.append(
                            (ts_us, tuple(row[n_keys + 2 : n_keys + 2 + n_left]))
                        )
                    else:
                        right_buf.append(
                            (ts_us, tuple(row[n_keys + 2 + n_left :]))
                        )

        wm_ms = state.getCurrentWatermarkMs()
        horizon_us = wm_ms * 1000

        def buf_key(x):
            # (ts, payload) ordering that tolerates None payload values
            # (None sorts first within its position; same-position values
            # share a column type, so comparisons never cross types)
            return (x[0],) + tuple(
                (v is not None, v if v is not None else 0) for v in x[1]
            )

        right_buf.sort(key=buf_key)
        rts_sorted = [x[0] for x in right_buf]

        emit_rows = []
        pending = []
        for lt_us, payload in sorted(left_buf, key=buf_key):
            if lt_us > horizon_us:
                pending.append((lt_us, payload))
                continue
            i = bisect_right(rts_sorted, lt_us) - 1
            match = None
            if i >= 0 and (tol_us is None or lt_us - right_buf[i][0] <= tol_us):
                match = right_buf[i]
            lt = pd.Timestamp(lt_us, unit="us")
            if match is None:
                emit_rows.append(
                    key + (lt,) + payload + (None,) * (1 + n_right)
                )
            else:
                emit_rows.append(
                    key
                    + (lt,)
                    + payload
                    + (pd.Timestamp(match[0], unit="us"),)
                    + match[1]
                )

        # evict right rows at/below the horizon except the latest one —
        # the "current state" a future left row may still match
        cut = bisect_right(rts_sorted, horizon_us)
        keep_from = max(0, cut - 1)
        right_buf = right_buf[keep_from:]

        if pending or right_buf:
            state.update((pickle.dumps((pending, right_buf)),))
            if pending:
                # flush when the watermark passes the earliest pending
                # left row even if no new data reaches this key
                state.setTimeoutTimestamp(max(pending[0][0] // 1000, wm_ms + 1))
        elif state.exists:
            state.remove()

        cols = keys + [left_ts] + left_payload + [ts_out] + [c + suffix for c in right_cols]
        out = pd.DataFrame(emit_rows, columns=cols)
        yield out.reindex(columns=out_names)

    return unioned.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="buf binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
