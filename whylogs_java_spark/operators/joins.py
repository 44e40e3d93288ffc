"""As-of and range joins: the temporal join surface Spark lacks.

No reference counterpart (whylogs-java has no joins at all — SURVEY.md
§2.3); these are the two join shapes an event/feature pipeline needs
beyond equi-joins, implemented with scale-safe plans:

- ``asof_join`` — for every left row, the latest right row at-or-before
  it (per key). The naive formulation is a range join that Spark plans
  as BroadcastNestedLoopJoin (quadratic per key); here it is the
  union-merge pattern instead: tag both sides, ONE shuffle on the key,
  and a running ``last(right_payload, ignorenulls)`` window carries the
  most recent right row forward in time order. Cost is a single
  Exchange + per-key sort — the same bound as sessionization
  (operators/sessions.py), with the same mega-key skew note.

- ``range_join_points`` — point-in-interval join without a cross
  product. Intervals explode to the fixed-width buckets they span
  (``F.sequence`` — bounded by interval length / width), points map to
  their single bucket, and the join is a plain equi-join on
  (keys…, bucket) followed by the exact containment filter. A point's
  bucket equals exactly one of the interval's exploded buckets, so no
  post-join dedup is needed. At 100 TB this is a shuffle on
  (keys…, bucket) whose fan-out is controlled by ``bucket_width``;
  skewed buckets fall to AQE skew-join handling like any equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_r",
    right_tiebreak: str | None = None,
    time_buckets: int | None = None,
) -> DataFrame:
    """Left rows + the nearest right row per key at-or-before them.

    ``direction="backward"`` (default): match the right row with the
    greatest ``right_ts`` <= ``left_ts``; ``"forward"``: the smallest
    ``right_ts`` >= ``left_ts``; ``"nearest"``: whichever of the two is
    closer in absolute distance (equal gaps prefer the backward match —
    pandas ``merge_asof`` semantics, pinned by a randomized pytest).
    Equality matches in every direction. ``tolerance`` nulls out
    matches farther than that from the left timestamp — the match is
    dropped, not replaced by the next-nearest (for ``nearest`` it
    applies per side before the pick, so the nearer-but-out-of-range
    side loses to a qualifying farther side — pandas semantics). Units:
    SECONDS when the ts columns are timestamps (matching
    ``asof_enrich_stream``), the column's own units when numeric.

    Matched right columns (``right_cols``, default: all non-key,
    non-ts) come back as ``<name><suffix>`` plus ``<right_ts><suffix>``;
    unmatched left rows keep them NULL (left join semantics).

    If several right rows share (key, ts), the one with the greatest
    ``right_tiebreak`` (or the last in arbitrary order if unset — pass
    a tiebreak for deterministic output) wins. The tiebreak orders in
    its OWN type (strings compare lexicographically; no numeric cast).

    ``time_buckets=n`` is the hot-key remedy (SCALE.md): a single key
    holding a pathological share of rows makes the per-key sort a
    straggler. With n > 1 the timeline is split into n equal global
    time ranges; the running-state window runs per (key, range) — the
    per-task sort shrinks by ~n — and a per-(key, range) boundary
    aggregate (the final right state of each range, O(keys × n) rows)
    is carried across ranges so every cross-range match is preserved.
    Output is row-for-row identical to the unbucketed plan; costs one
    extra aggregate over the union plus a tiny boundary join that
    pre-shuffles on the window's own (key, range) key.

    NULL semantics follow SQL / DuckDB ASOF / pandas merge_asof: right
    rows with a NULL timestamp or NULL key can never match (they are
    dropped before the union), and left rows with a NULL timestamp or
    NULL key get NULL match columns (a NULL key equals nothing, not
    even another NULL).

    Plan: union of the two tagged sides -> ONE Exchange on ``on`` ->
    per-key sort on (ts, side, tiebreak) -> running last(ignorenulls)
    -> filter back to left rows. No nested-loop join, no range
    predicate reaches the planner.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest" and time_buckets is not None and time_buckets > 1:
        raise ValueError(
            "time_buckets is not supported with direction='nearest' — run "
            "backward and forward bucketed joins and pick per row, or use "
            "the unbucketed nearest"
        )
    keys = [on] if isinstance(on, str) else list(on)
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != rts]

    payload = F.struct(
        F.col(rts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_cols],
        *(
            # raw column, NOT cast to double: a string tiebreak must
            # order lexicographically, not become all-NULL silently
            [F.col(right_tiebreak).alias("__tb")]
            if right_tiebreak
            else [F.lit(0.0).alias("__tb")]
        ),
    )
    # NULL-ts / NULL-key right rows can never match; dropping them here
    # also keeps them out of the window's carry-forward state (a NULL ts
    # sorts first under asc and would otherwise be carried as a match).
    for c in [rts, *keys]:
        right = right.where(F.col(c).isNotNull())

    left_cols = left.columns
    l_payload = F.struct(*[F.col(c).alias(c) for c in left_cols])
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__rp"),
        F.lit(None).cast(left.select(l_payload.alias("s")).schema["s"].dataType).alias("__lp"),
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.select(payload.alias("s")).schema["s"].dataType).alias("__rp"),
        l_payload.alias("__lp"),
    )
    both = r_side.unionByName(l_side)

    # Backward: ascending time, right rows (side 0) before left at equal
    # ts so an equal-timestamp right row is visible. Forward: descending
    # time, same side order -> running last sees the nearest later row.
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    # Among equal (key, ts) right rows the LAST in tiebreak order wins
    # the running last(); ascending tiebreak makes that the greatest, in
    # both directions (equal-ts rows are adjacent either way).
    tb_order = F.col("__rp.__tb").asc_nulls_first()

    if direction == "nearest":
        # pandas merge_asof nearest semantics: the right row with the
        # smallest |left_ts - right_ts| per key; tolerance applies to
        # the absolute gap on each side BEFORE choosing; equal gaps
        # prefer the backward (at-or-before) match. ONE exchange, two
        # sorted window passes over it (asc for the backward state,
        # desc for the forward state), then a per-row pick.
        from pyspark.sql.types import TimestampNTZType, TimestampType

        w_b = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), F.col("__side").asc(), tb_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_f = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__t").desc(), F.col("__side").asc(), tb_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = both.withColumn(
            "__mb", F.last("__rp", ignorenulls=True).over(w_b)
        ).withColumn("__mf", F.last("__rp", ignorenulls=True).over(w_f))
        mb, mf = F.col("__mb"), F.col("__mf")
        t_type = both.schema["__t"].dataType
        if isinstance(t_type, (TimestampType, TimestampNTZType)):
            tval = F.unix_micros(F.col("__t").cast("timestamp"))
            b_ts = F.unix_micros(mb["__ts"].cast("timestamp"))
            f_ts = F.unix_micros(mf["__ts"].cast("timestamp"))
            tol = (
                F.lit(int(tolerance * 1_000_000))
                if tolerance is not None
                else None
            )
        else:
            tval, b_ts, f_ts = F.col("__t"), mb["__ts"], mf["__ts"]
            tol = F.lit(tolerance) if tolerance is not None else None
        gap_b, gap_f = tval - b_ts, f_ts - tval
        mb_ok = mb.isNotNull() if tol is None else (mb.isNotNull() & (gap_b <= tol))
        mf_ok = mf.isNotNull() if tol is None else (mf.isNotNull() & (gap_f <= tol))
        m = (
            F.when(mb_ok & mf_ok, F.when(gap_b <= gap_f, mb).otherwise(mf))
            .when(mb_ok, mb)
            .when(mf_ok, mf)
        )
        left_valid = F.col("__t").isNotNull()
        for k in keys:
            left_valid = left_valid & F.col(k).isNotNull()
        m = F.when(left_valid, m)
        return matched.where(F.col("__side") == 1).select(
            *[F.col("__lp")[c].alias(c) for c in left_cols],
            m["__ts"].alias(rts + suffix),
            *[m[c].alias(c + suffix) for c in right_cols],
        )

    bucketed = time_buckets is not None and time_buckets > 1
    if bucketed:
        # Effective numeric time: forward negates so the bucketed
        # machinery is single-direction (ascending __e ≡ t_order), and
        # equal timestamps always land in the SAME range — no
        # cross-range equal-ts tiebreak cases exist by construction.
        from pyspark.sql.types import TimestampNTZType, TimestampType

        t_type = both.schema["__t"].dataType
        if isinstance(t_type, (TimestampType, TimestampNTZType)):
            base = F.unix_micros(F.col("__t").cast("timestamp")).cast("double")
        else:
            base = F.col("__t").cast("double")
        sign = F.lit(1.0) if direction == "backward" else F.lit(-1.0)
        both = both.withColumn("__e", sign * base)
        mm = both.agg(F.min("__e").alias("lo"), F.max("__e").alias("hi")).first()
        lo, hi = mm["lo"], mm["hi"]
        bucketed = lo is not None and hi is not None and hi > lo

    if bucketed:
        n = int(time_buckets)
        span = hi - lo
        rng = F.least(
            F.floor((F.col("__e") - F.lit(lo)) / F.lit(span) * F.lit(n)),
            F.lit(n - 1),
        ).cast("int")
        both = both.withColumn("__rng", rng)
        # Final right state per (key, range): greatest (__e, tiebreak)
        # among RIGHT rows (left rows order NULL and are ignored by
        # max_by). Grouping the full union keeps ranges that hold only
        # left rows present with a NULL state, so the carry below
        # reaches them too. Partial aggregation makes this one cheap
        # extra pass; the result is O(keys × n) rows.
        boundary = both.groupBy(*keys, "__rng").agg(
            F.max_by(
                F.col("__rp"),
                F.when(
                    F.col("__side") == 0,
                    F.struct(F.col("__e"), F.col("__rp.__tb")),
                ),
            ).alias("__bstate")
        )
        w_carry = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__rng").asc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carried = boundary.select(
            *keys,
            "__rng",
            F.last("__bstate", ignorenulls=True).over(w_carry).alias("__carry"),
        )
        # the (keys, __rng) equi-join pre-shuffles the union on exactly
        # the window's partitioning, so the window below reuses it
        both = both.join(carried, on=keys + ["__rng"], how="left")
        w = (
            Window.partitionBy(*keys, "__rng")
            .orderBy(F.col("__e").asc(), F.col("__side").asc(), tb_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = both.withColumn(
            "__m",
            F.coalesce(
                F.last("__rp", ignorenulls=True).over(w), F.col("__carry")
            ),
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(t_order, F.col("__side").asc(), tb_order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        matched = both.withColumn("__m", F.last("__rp", ignorenulls=True).over(w))

    m = F.col("__m")
    if tolerance is not None:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        t_type = both.schema["__t"].dataType
        if isinstance(t_type, (TimestampType, TimestampNTZType)):
            # timestamp columns: tolerance is SECONDS (matching the
            # streaming twin asof_enrich_stream) — a raw subtraction
            # yields a day-time interval that an int can't compare to
            lhs, rhs = F.unix_micros(F.col("__t")), F.unix_micros(m["__ts"])
            tol = F.lit(int(tolerance * 1_000_000))
        else:
            lhs, rhs, tol = F.col("__t"), m["__ts"], F.lit(tolerance)
        gap = (lhs - rhs) if direction == "backward" else (rhs - lhs)
        m = F.when(gap <= tol, F.col("__m"))
    # a left row with a NULL ts or NULL key matches nothing (under the
    # forward sort NULL ts lands last and would otherwise see the whole
    # partition; NULL keys would pair up via partitionBy, unlike SQL)
    left_valid = F.col("__t").isNotNull()
    for k in keys:
        left_valid = left_valid & F.col(k).isNotNull()
    m = F.when(left_valid, m)
    out = matched.where(F.col("__side") == 1).select(
        *[F.col("__lp")[c].alias(c) for c in left_cols],
        m["__ts"].alias(rts + suffix),
        *[m[c].alias(c + suffix) for c in right_cols],
    )
    return out


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | None = None,
    bucket_width: float = 1.0,
    closed: str = "left",
) -> DataFrame:
    """Equi-join plan for ``lo <= point < hi`` (point-in-interval).

    ``closed``: "left" ([lo, hi)), "both" ([lo, hi]), "right" ((lo, hi]),
    "neither" ((lo, hi)). ``on`` adds equi-key columns shared by both
    sides. Output: all point columns + all interval columns (names must
    not collide; alias beforehand).

    Each interval explodes to ``1 + floor(hi/w) - floor(lo/w)`` bucket
    rows — pick ``bucket_width`` near the typical interval length so the
    explode factor stays O(1). Catalyst plans the result as a shuffled
    hash equi-join on (keys…, bucket): no BroadcastNestedLoopJoin, and a
    small interval side still broadcasts automatically under AQE.
    """
    on = on or []
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    p = points.withColumn("__bucket", point_bucket(point_col, w))
    i = intervals.withColumn(
        "__bucket", F.explode(interval_buckets(lo_col, hi_col, w))
    )
    joined = p.join(i, on=on + ["__bucket"], how="inner").where(
        containment_predicate(point_col, lo_col, hi_col, closed)
    )
    return joined.drop("__bucket")


def point_bucket(point_col: str, bucket_width: float):
    """The single fixed-width bucket a point falls in (shared by the
    batch and streaming point-in-interval joins)."""
    return F.floor(F.col(point_col) / F.lit(float(bucket_width))).cast("long")


def interval_buckets(lo_col: str, hi_col: str, bucket_width: float):
    """Array of every fixed-width bucket an interval spans."""
    w = float(bucket_width)
    return F.sequence(
        F.floor(F.col(lo_col) / F.lit(w)).cast("long"),
        F.floor(F.col(hi_col) / F.lit(w)).cast("long"),
    )


def containment_predicate(point_col: str, lo_col: str, hi_col: str, closed: str):
    """Exact lo/hi containment for the ``closed`` mode."""
    lo_ok = {
        "left": F.col(point_col) >= F.col(lo_col),
        "both": F.col(point_col) >= F.col(lo_col),
        "right": F.col(point_col) > F.col(lo_col),
        "neither": F.col(point_col) > F.col(lo_col),
    }[closed]
    hi_ok = {
        "left": F.col(point_col) < F.col(hi_col),
        "both": F.col(point_col) <= F.col(hi_col),
        "right": F.col(point_col) <= F.col(hi_col),
        "neither": F.col(point_col) < F.col(hi_col),
    }[closed]
    return lo_ok & hi_ok


def range_join_intervals(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    on: list[str] | None = None,
    bucket_width: float = 1.0,
) -> DataFrame:
    """Interval-overlap join (closed intervals: ``lo_a <= hi_b AND
    lo_b <= hi_a``) as a bucketed equi-join.

    Both sides explode to the fixed-width buckets they span and join per
    (keys…, bucket). An overlapping pair shares every bucket between
    ``max(lo)`` and ``min(hi)``, which would duplicate the pair — so the
    join keeps only the FIRST shared bucket, ``floor(max(lo_a, lo_b) /
    w)``: it lies inside both intervals whenever they overlap, each pair
    owns exactly one such bucket, and no post-join ``distinct`` (a
    second full shuffle) is needed.

    Column names (besides ``on`` keys) must be distinct across the two
    sides; alias beforehand. Explode factor per row = interval length /
    ``bucket_width`` — pick the width near the typical interval length.
    """
    on = on or []
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def buckets(lo: str, hi: str):
        return F.sequence(
            F.floor(F.col(lo) / F.lit(w)).cast("long"),
            F.floor(F.col(hi) / F.lit(w)).cast("long"),
        )

    l = left.withColumn("__bucket", F.explode(buckets(left_lo, left_hi)))
    r = right.withColumn("__bucket", F.explode(buckets(right_lo, right_hi)))

    overlap = (F.col(left_lo) <= F.col(right_hi)) & (
        F.col(right_lo) <= F.col(left_hi)
    )
    first_shared = (
        F.floor(F.greatest(F.col(left_lo), F.col(right_lo)) / F.lit(w)).cast("long")
        == F.col("__bucket")
    )
    return (
        l.join(r, on=on + ["__bucket"], how="inner")
        .where(overlap & first_shared)
        .drop("__bucket")
    )
