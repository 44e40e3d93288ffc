"""Streaming drift: windowed category OR numeric-bin frequencies scored
against a static reference distribution.

The monitoring loop a profile store exists for: a reference slice (last
week, the training set) is reduced once to per-category fractions, and
the live stream's windows are scored against it continuously. No
reference counterpart (whylogs-java has no streaming operators —
SURVEY.md §2.10); this is the streaming face of operators/drift.py.

Design: Structured Streaming allows ONE stateful aggregation per query,
so the stream side does exactly one — counts per (window, group, cat) —
and the PSI reduction over a window's categories happens either:

- in ``drift_scores`` applied inside ``foreachBatch`` (batch DataFrame →
  same math as operators/drift.categorical_drift, reference broadcast),
  the shape every other sink in this package uses; or
- downstream on the compacted counts sink.

The reference table is O(categories) rows and broadcast-joined, so a
window's score costs one small join + hash-agg per micro-batch; stream
state is the bounded windowed-counts state (watermark-expired), never
the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.drift import NULL_CAT as _NULL_CAT
from ..operators.drift import PSI_EPS


# sentinel category for invalid numeric values (NULL/NaN/±Inf). They are
# COUNTED, deliberately: a stream whose values go NaN is drifting — the
# category shows up against any clean reference and drives PSI up — and
# counting (rather than filtering) keeps every row advancing the event-
# time watermark. A pre-aggregation filter would NOT: Catalyst pushes
# deterministic filters below the EventTimeWatermark collector, so an
# all-invalid stream would freeze the watermark and stall window
# emission (verified empirically: eventTime.max ignored filtered rows).
INVALID_CAT = "\x01invalid"


def _cat_expr(column: str):
    """Category column with the shared NULL sentinel."""
    return F.coalesce(F.col(column).cast("string"), F.lit(_NULL_CAT))


def _bin_cat_expr(column: str, splits):
    """Numeric split-point bin index, stringified to act as a category;
    invalid values (NULL/NaN/±Inf) map to ``INVALID_CAT``."""
    from ..operators.drift import _bin_index, _valid_value

    v = F.col(column).cast("double")
    return F.coalesce(
        F.when(_valid_value(v), _bin_index(v, splits).cast("string")),
        F.lit(INVALID_CAT),
    )


def _reference_fracs(df: DataFrame, cat, keys: list[str]) -> DataFrame:
    from ..operators.drift import _group_window

    counts = (
        df.select(*keys, cat.alias("cat"))
        .groupBy(*keys, "cat")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = F.sum("n").over(_group_window(keys))
    return counts.select(*keys, "cat", (F.col("n") / tot).alias("p_ref"))


def _windowed_counts(
    stream_df: DataFrame,
    cat,
    time_column: str,
    window_duration: str,
    slide_duration: str | None,
    watermark: str,
    keys: list[str],
) -> DataFrame:
    win = (
        F.window(F.col(time_column), window_duration, slide_duration)
        if slide_duration
        else F.window(F.col(time_column), window_duration)
    )
    return (
        stream_df.withWatermark(time_column, watermark)
        .select(F.col(time_column), *keys, cat.alias("cat"))
        .groupBy(win.alias("window"), *keys, "cat")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "cat",
            "n",
        )
    )


def reference_fractions(
    df: DataFrame, column: str, group_by: Sequence[str] = ()
) -> DataFrame:
    """(keys..., cat, p_ref) from a static reference slice. NULLs map to
    the same sentinel category as operators/drift.categorical_drift."""
    return _reference_fracs(df, _cat_expr(column), list(group_by))


def windowed_category_counts(
    stream_df: DataFrame,
    column: str,
    time_column: str,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str = "10 minutes",
    group_by: Sequence[str] = (),
) -> DataFrame:
    """The one stateful step: streaming counts per (window, keys, cat).

    Append mode emits a window's counts once its watermark passes —
    score those finalized rows with ``drift_scores``.
    """
    return _windowed_counts(
        stream_df, _cat_expr(column), time_column,
        window_duration, slide_duration, watermark, list(group_by),
    )


def reference_bin_fractions(
    df: DataFrame,
    column: str,
    splits,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Numeric twin of ``reference_fractions``: (keys..., cat, p_ref)
    where ``cat`` is the split-point bin index as a string — feed the
    result to ``drift_scores`` together with ``windowed_bin_counts``."""
    return _reference_fracs(df, _bin_cat_expr(column, splits), list(group_by))


def windowed_bin_counts(
    stream_df: DataFrame,
    column: str,
    splits,
    time_column: str,
    window_duration: str = "1 hour",
    slide_duration: str | None = None,
    watermark: str = "10 minutes",
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Streaming counts per (window, keys, bin) for a NUMERIC column —
    the same one-stateful-agg shape as ``windowed_category_counts`` with
    the split-point bin index (stringified) as the category, so
    ``drift_scores`` scores both kinds identically. Invalid values
    (NULL/NaN/±Inf) count under ``INVALID_CAT`` — see its comment: they
    both advance the watermark and register as drift."""
    return _windowed_counts(
        stream_df, _bin_cat_expr(column, splits), time_column,
        window_duration, slide_duration, watermark, list(group_by),
    )


def rolling_window_topk(
    counts: DataFrame,
    k: int = 10,
    group_by: Sequence[str] = (),
    slide_seconds: int | None = None,
) -> DataFrame:
    """Window-over-window heavy-hitter churn — the top-k sibling of
    ``rolling_window_scores`` over the same windowed-counts table
    (``windowed_category_counts`` output, batch-compacted or inside
    ``foreachBatch``): each window's top-k categories vs the previous
    window's, with new/vanished/moved/stable statuses.

    Stride semantics match ``rolling_window_scores``: tumbling by
    default, pass ``slide_seconds`` for sliding counts. Windows whose
    predecessor emitted no counts drop (gap reset). Everything runs
    over aggregate-sized rows.
    """
    from pyspark.sql import Window

    keys = list(group_by)
    if slide_seconds is not None and slide_seconds <= 0:
        raise ValueError("slide_seconds must be a positive number of seconds")
    win_len = F.col("window_end").cast("long") - F.col("window_start").cast(
        "long"
    )
    stride = F.lit(int(slide_seconds)) if slide_seconds is not None else win_len
    w = Window.partitionBy("window_start", *keys).orderBy(
        F.col("n").desc(), F.col("cat").asc()
    )
    ranked = counts.select(
        "window_start",
        (F.col("window_start") + F.make_interval(secs=stride)).alias("__next"),
        *keys,
        "cat",
        "n",
        F.row_number().over(w).alias("rank"),
    ).where(F.col("rank") <= k)
    cur = ranked.select(
        "window_start", *keys, "cat",
        F.col("n").alias("count_cur"), F.col("rank").alias("rank_cur"),
    )
    prev = ranked.select(
        F.col("__next").alias("window_start"), *keys, "cat",
        F.col("n").alias("count_prev"), F.col("rank").alias("rank_prev"),
    )
    both_windows = (
        ranked.select("window_start", *keys)
        .distinct()
        .join(
            prev.select("window_start", *keys).distinct(),
            on=["window_start", *keys],
        )
    )
    j = cur.join(prev, on=["window_start", *keys, "cat"], how="full").join(
        F.broadcast(both_windows), on=["window_start", *keys]
    )
    rc, rp = F.col("rank_cur"), F.col("rank_prev")
    status = (
        F.when(rp.isNull(), F.lit("new"))
        .when(rc.isNull(), F.lit("vanished"))
        .when(rc != rp, F.lit("moved"))
        .otherwise(F.lit("stable"))
    )
    return j.select(
        "window_start", *keys, "cat",
        "count_cur", "count_prev",
        rc.alias("rank_cur"), rp.alias("rank_prev"),
        status.alias("status"),
    )


def rolling_window_scores(
    counts: DataFrame,
    group_by: Sequence[str] = (),
    eps: float = PSI_EPS,
    slide_seconds: int | None = None,
) -> DataFrame:
    """PSI / L1 / L-inf of each window vs the PREVIOUS window — the
    reference-FREE rolling monitor over a windowed-counts table (the
    output of ``windowed_category_counts`` / ``windowed_bin_counts``,
    batch-compacted or inside ``foreachBatch``).

    The previous side is the same counts table with ``window_start``
    shifted forward by the window STRIDE. Default (``slide_seconds``
    None) assumes TUMBLING windows and shifts by one window length; if
    the counts came from a sliding aggregation (``slide_duration`` set
    upstream) you MUST pass the slide in seconds here, or every window
    would silently be compared against one a full window length back
    instead of the immediately preceding slide. Windows whose
    predecessor is absent (the first window, or one after a gap) are
    dropped — a gap resets the comparison, the same contract as
    operators/drift.rolling_drift. All joins and windows run over
    aggregate-sized rows.
    """
    keys = list(group_by)
    if slide_seconds is not None and slide_seconds <= 0:
        raise ValueError("slide_seconds must be a positive number of seconds")
    win_len = F.col("window_end").cast("long") - F.col("window_start").cast("long")
    stride = F.lit(int(slide_seconds)) if slide_seconds is not None else win_len
    cur = counts.select(
        "window_start", "window_end", *keys, "cat", F.col("n").alias("n_cur")
    )
    prev = counts.select(
        (F.col("window_start") + F.make_interval(secs=stride)).alias(
            "window_start"
        ),
        *keys,
        "cat",
        F.col("n").alias("n_prev"),
    )
    both = cur.join(
        prev, on=["window_start", *keys, "cat"], how="full"
    ).select(
        "window_start",
        "window_end",
        *keys,
        "cat",
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        F.coalesce(F.col("n_prev"), F.lit(0)).alias("n_prev"),
    )
    from ..operators.drift import _group_window

    wk = ["window_start", *keys]
    tot_c = F.sum("n_cur").over(_group_window(wk))
    tot_p = F.sum("n_prev").over(_group_window(wk))
    pc_raw = F.coalesce(F.try_divide(F.col("n_cur"), tot_c), F.lit(0.0))
    pp_raw = F.coalesce(F.try_divide(F.col("n_prev"), tot_p), F.lit(0.0))
    pc = F.greatest(pc_raw, F.lit(eps))
    pp = F.greatest(pp_raw, F.lit(eps))
    per = both.select(
        "window_start",
        "window_end",
        *keys,
        F.col("n_cur"),
        F.col("n_prev"),
        ((pc - pp) * (F.log(pc) - F.log(pp))).alias("__psi_term"),
        F.abs(pc_raw - pp_raw).alias("__gap"),
    )
    out = per.groupBy("window_start", *keys).agg(
        F.max("window_end").alias("window_end"),
        F.sum("n_cur").alias("count_cur"),
        F.sum("n_prev").alias("count_prev"),
        F.sum("__psi_term").alias("psi"),
        F.sum("__gap").alias("l1"),
        F.max("__gap").alias("linf"),
    )
    return out.where(
        (F.col("count_prev") > 0) & (F.col("count_cur") > 0)
    ).select(
        "window_start", "window_end", *keys,
        "count_cur", "count_prev", "psi", "l1", "linf",
    )


def drift_scores(
    counts: DataFrame,
    reference: DataFrame,
    group_by: Sequence[str] = (),
    eps: float = PSI_EPS,
) -> DataFrame:
    """PSI / L1 / L-inf per (window, keys) from windowed counts vs the
    reference fractions (output of ``reference_fractions``).

    Works on the batch handed to ``foreachBatch`` or on a compacted
    counts table. The join is a broadcast of the reference (O(categories)
    rows); categories seen only in the reference still count against
    drift (full outer per window via a window-key cross of the reference).
    """
    keys = list(group_by)
    win_keys = ["window_start", "window_end", *keys]

    # every (window, key) needs the reference's full category set so a
    # category that disappeared from the live stream still contributes.
    # The window list derives from `counts` itself, so its columns are
    # renamed through fresh aliases before the full-outer self-join —
    # otherwise both join branches carry the same attribute ids and the
    # analyzer rejects the plan (conflicting references).
    wk_alias = {c: f"__wk{i}" for i, c in enumerate(win_keys)}
    windows = counts.select(
        *[F.col(c).alias(wk_alias[c]) for c in win_keys]
    ).distinct()
    ref_b = F.broadcast(reference)
    if keys:
        cond = None
        for k in keys:
            c = windows[wk_alias[k]] == reference[k]
            cond = c if cond is None else (cond & c)
        ref_expanded = windows.join(ref_b, on=cond, how="inner")
    else:
        ref_expanded = windows.crossJoin(ref_b)
    ref_expanded = ref_expanded.select(
        *[F.col(wk_alias[c]).alias(c) for c in win_keys], "cat", "p_ref"
    )

    full = ref_expanded.join(
        counts, on=win_keys + ["cat"], how="full"
    ).select(
        *win_keys,
        "cat",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("p_ref"), F.lit(0.0)).alias("p_ref"),
    )

    from ..operators.drift import _group_window

    tot = F.sum("n").over(_group_window(win_keys))
    p_live_raw = F.coalesce(F.try_divide(F.col("n"), tot), F.lit(0.0))
    p_live = F.greatest(p_live_raw, F.lit(eps))
    p_ref = F.greatest(F.col("p_ref"), F.lit(eps))
    per = full.select(
        *win_keys,
        ((p_live - p_ref) * (F.log(p_live) - F.log(p_ref))).alias("__psi_term"),
        F.abs(p_live_raw - F.col("p_ref")).alias("__gap"),
    )
    return per.groupBy(*win_keys).agg(
        F.sum("__psi_term").alias("psi"),
        F.sum("__gap").alias("l1"),
        F.max("__gap").alias("linf"),
    )
