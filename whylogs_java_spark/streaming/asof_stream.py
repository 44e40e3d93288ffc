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
