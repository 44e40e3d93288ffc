"""Per-column metric expression builders — the heart of the engine.

The reference keeps one ColumnProfile per column holding counters, a schema
tracker, a NumberTracker (min/max/sum/mean/variance + sketches) and a
StringTracker (length/token stats) — all associative & mergeable
(core/.../ColumnProfile.java:37-74, core/.../statistics/NumberTracker.java:23-40,
core/.../statistics/datatypes/StringTracker.java:24-49). Here every tracker
becomes a set of built-in Catalyst aggregate expressions over the masked
column, so a whole DatasetProfile is ONE ``df.groupBy(keys).agg(*exprs)``
with map-side partial aggregation and whole-stage codegen — no opaque
Java-serialized buffers (contrast DatasetProfileAggregator.scala:125-127).

Mergeability: we aggregate *atoms* — counts, min, max, exact hi/lo long
sums of x and x² (and of derived length/token-count columns). Two profiles merge by
summing counts/sums and min/max-ing extremes, exactly the algebra of
DatasetProfile.merge (DatasetProfile.java:251-300) and Chan's variance
combine (VarianceTracker.java:49-69) re-expressed on (n, Σx, Σx²).

Determinism note: floating sums use exact integer accumulation (floor part
+ 1e-6-quantized fractional part as LONGs), which is order-independent and
reproduces bit-identically in DuckDB oracles; all derived doubles
(mean/variance/stddev) are computed from those exact atoms with the same
double arithmetic on both engines. See _split_sum for overflow bounds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import ROUND_DIGITS, TOKEN_DELIMITER
from .inference import inferred_type_expr
from .predicates import (
    BOOLEAN_RE,
    FRACTIONAL_RE,
    INTEGRAL_RE,
    is_floating,
    is_integral,
    is_numeric,
    masked,
    null_predicate,
)

# ---------------------------------------------------------------------------
# numeric atom suite over an arbitrary (already-masked) numeric Column
# ---------------------------------------------------------------------------


def _cnt(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def _split_sum(d: Column, prefix: str, suffix: str) -> list[Column]:
    """Exact order-independent sum of doubles, split hi/lo, as LONG sums.

    ``hi`` accumulates floor(x); ``lo`` the fractional remainder quantized
    to 1e-6 (the engine's 6-decimal sum resolution). Integer sums are
    associative/commutative -> results are independent of partitioning and
    merge order, and LONG->DOUBLE conversion is correctly rounded in every
    engine, so finalized doubles are bit-identical in the DuckDB oracles.
    LONG aggregation also stays inside whole-stage codegen — ~10x faster
    than DECIMAL(38,_) aggregation (BigDecimal-backed, measured on sf0.1).

    Overflow bounds (long max ~9.2e18): ``lo`` ≤ 1e6/row -> safe to ~9e12
    rows/group; ``hi`` of x² for |x|~1e5 -> safe to ~7e8 rows/group. For
    extreme single-group scans beyond that, swap SUM_LONG_MODE for the
    DECIMAL(38,6) variants (same algebra, slower path).
    """
    hi = F.floor(d)  # long for double input
    lo = F.round((d - F.floor(d)) * 1000000.0, 0).cast("long")
    return [
        F.sum(hi).alias(f"{prefix}_{suffix}_hi"),
        F.sum(lo).alias(f"{prefix}_{suffix}_lo"),
    ]


def numeric_atom_exprs(val: Column, prefix: str) -> list[Column]:
    """Atoms for one NumberTracker suite: n, min, max, Σx, Σx² (exact).

    ``val`` must already be null-masked; NULLs are skipped by the aggregates
    just as the reference skips isNull values (ColumnProfile.java:87-117).
    """
    d = val.cast("double")
    return [
        F.count(val).alias(f"{prefix}_n"),
        F.min(d).alias(f"{prefix}_min"),
        F.max(d).alias(f"{prefix}_max"),
        *_split_sum(d, prefix, "sum"),
        *_split_sum(d * d, prefix, "sum2"),
    ]


def numeric_final_exprs(row_prefix: str, out_prefix: str = "") -> dict[str, Column]:
    """Finalize a numeric atom suite into summary metrics.

    variance is sample variance (n-1) from exact sums; n==1 -> 0.0, n==0 ->
    NULL (the reference yields NaN for n==0 — VarianceTracker.java:31-46 — we
    use SQL NULL; documented deviation for SQL-comparability).
    """
    n = F.col(f"{row_prefix}_n")
    sx = (
        F.col(f"{row_prefix}_sum_hi").cast("double")
        + F.col(f"{row_prefix}_sum_lo").cast("double") / 1000000.0
    )
    sx2 = (
        F.col(f"{row_prefix}_sum2_hi").cast("double")
        + F.col(f"{row_prefix}_sum2_lo").cast("double") / 1000000.0
    )
    mean = sx / n
    # clamp tiny negative cancellation residue to 0 (also keeps the SQL
    # oracle's SQRT total); `+ 0.0` normalizes -0.0 -> +0.0 on both engines
    var = F.when(n > 1, F.greatest((sx2 - sx * sx / n) / (n - 1), F.lit(0.0))).when(
        n == 1, F.lit(0.0)
    )
    o = out_prefix
    return {
        f"{o}n": n,
        f"{o}min": F.col(f"{row_prefix}_min"),
        f"{o}max": F.col(f"{row_prefix}_max"),
        f"{o}sum": F.round(sx, ROUND_DIGITS) + 0.0,
        f"{o}mean": F.when(n > 0, F.round(mean, ROUND_DIGITS) + 0.0),
        f"{o}variance": F.round(var, ROUND_DIGITS) + 0.0,
        f"{o}stddev": F.round(F.sqrt(var), ROUND_DIGITS) + 0.0,
    }


def numeric_atom_sql(val_sql: str, prefix: str) -> str:
    """DuckDB aggregate SQL for the same atoms (``val_sql`` pre-masked)."""
    d = f"CAST({val_sql} AS DOUBLE)"
    d2 = f"({d} * {d})"
    return (
        f"COUNT({val_sql}) AS {prefix}_n, "
        f"MIN({d}) AS {prefix}_min, MAX({d}) AS {prefix}_max, "
        f"SUM(CAST(FLOOR({d}) AS BIGINT)) AS {prefix}_sum_hi, "
        f"SUM(CAST(ROUND(({d} - FLOOR({d})) * 1000000.0, 0) AS BIGINT)) AS {prefix}_sum_lo, "
        f"SUM(CAST(FLOOR({d2}) AS BIGINT)) AS {prefix}_sum2_hi, "
        f"SUM(CAST(ROUND(({d2} - FLOOR({d2})) * 1000000.0, 0) AS BIGINT)) AS {prefix}_sum2_lo"
    )


def numeric_final_sql(row_prefix: str, out_prefix: str = "") -> str:
    n = f"{row_prefix}_n"
    sx = f"(CAST({row_prefix}_sum_hi AS DOUBLE) + CAST({row_prefix}_sum_lo AS DOUBLE) / 1000000.0)"
    sx2 = f"(CAST({row_prefix}_sum2_hi AS DOUBLE) + CAST({row_prefix}_sum2_lo AS DOUBLE) / 1000000.0)"
    var = (
        f"CASE WHEN {n} > 1 THEN GREATEST(({sx2} - {sx} * {sx} / {n}) / ({n} - 1), 0.0) "
        f"WHEN {n} = 1 THEN 0.0 END"
    )
    o = out_prefix
    return (
        f"{n} AS {o}n, {row_prefix}_min AS {o}min, {row_prefix}_max AS {o}max, "
        f"ROUND({sx}, {ROUND_DIGITS}) + 0.0 AS {o}sum, "
        f"CASE WHEN {n} > 0 THEN ROUND({sx} / {n}, {ROUND_DIGITS}) + 0.0 END AS {o}mean, "
        f"ROUND({var}, {ROUND_DIGITS}) + 0.0 AS {o}variance, "
        f"ROUND(SQRT({var}), {ROUND_DIGITS}) + 0.0 AS {o}stddev"
    )


# ---------------------------------------------------------------------------
# full per-column profile spec
# ---------------------------------------------------------------------------

ATOM_METRICS = [
    # (field name, spark type) — the mergeable long-format atom schema
    ("count", "long"),
    ("null_count", "long"),
    ("true_count", "long"),
    ("integral_count", "long"),
    ("fractional_count", "long"),
    ("boolean_count", "long"),
    ("string_count", "long"),
    ("unknown_count", "long"),
    ("num_n", "long"),
    ("num_min", "double"),
    ("num_max", "double"),
    ("num_sum_hi", "long"),
    ("num_sum_lo", "long"),
    ("num_sum2_hi", "long"),
    ("num_sum2_lo", "long"),
    ("len_n", "long"),
    ("len_min", "double"),
    ("len_max", "double"),
    ("len_sum_hi", "long"),
    ("len_sum_lo", "long"),
    ("len_sum2_hi", "long"),
    ("len_sum2_lo", "long"),
    ("tok_n", "long"),
    ("tok_min", "double"),
    ("tok_max", "double"),
    ("tok_sum_hi", "long"),
    ("tok_sum_lo", "long"),
    ("tok_sum2_hi", "long"),
    ("tok_sum2_lo", "long"),
]


@dataclass
class ColumnProfileSpec:
    """Builds the aggregate expressions profiling one source column.

    Mirrors ColumnProfile.track's per-type dispatch
    (core/.../ColumnProfile.java:76-117): counters always update; numeric
    values feed the NumberTracker suite; strings feed the StringTracker
    (length + token-count suites); booleans feed trueCount. Because Spark
    columns are statically typed, the per-value type dispatch collapses to a
    per-column choice of which suites are non-trivial — the same
    simplification the reference's Spark layer gets from typed Datasets.
    """

    name: str
    dt: T.DataType
    null_strings: tuple[str, ...] = ()
    coerce_strings: bool = False  # TypedDataConverter string matching (opt-in)
    tokenizer_delim: str = TOKEN_DELIMITER

    def __post_init__(self) -> None:
        self.key = self.name  # alias prefix; source names are parquet-safe

    # -- two-phase: projection + aggregation ------------------------------
    #
    # Aggregate expressions don't share subexpressions across each other in
    # codegen, so computing mask/floor/split once per *row* in a projection
    # and aggregating plain attributes is much cheaper than embedding the
    # derivations in every aggregate (measured ~2x on the sf0.1 flagship).

    def projection_exprs(self) -> list[Column]:
        """Row-level derived columns consumed by ``agg_exprs``."""
        c = F.col(self.name)
        dt = self.dt
        p = self.key
        out = [
            null_predicate(c, dt, self.null_strings).cast("int").alias(f"{p}__isnull")
        ]
        m = masked(c, dt, self.null_strings)
        if isinstance(dt, T.BooleanType):
            out.append((m == F.lit(True)).cast("int").alias(f"{p}__true"))
        if is_numeric(dt) and not isinstance(dt, T.BooleanType):
            out += _num_projection(m.cast("double"), f"{p}__num")
        if isinstance(dt, T.StringType):
            out += _num_projection(F.length(m).cast("double"), f"{p}__len")
            out += _num_projection(
                F.size(F.split(m, self.tokenizer_delim)).cast("double"), f"{p}__tok"
            )
            if self.coerce_strings:
                out += [
                    m.rlike(INTEGRAL_RE).cast("int").alias(f"{p}__is_int"),
                    m.rlike(FRACTIONAL_RE).cast("int").alias(f"{p}__is_frac"),
                    m.rlike(BOOLEAN_RE).cast("int").alias(f"{p}__is_bool"),
                ]
        return out

    def agg_exprs(self) -> list[Column]:
        """Aggregates over the projected attributes (plain sums/min/max)."""
        dt = self.dt
        p = self.key
        cnt = F.count(F.lit(1)).cast("long")
        nullc = F.sum(f"{p}__isnull").cast("long")
        nn = (cnt - nullc).cast("long")
        zero = F.max(F.lit(0)).cast("long")

        exprs: list[Column] = [
            cnt.alias(f"{p}_count"),
            nullc.alias(f"{p}_null_count"),
            (
                F.sum(f"{p}__true").cast("long")
                if isinstance(dt, T.BooleanType)
                else zero
            ).alias(f"{p}_true_count"),
        ]

        tc: dict[str, Column] = dict.fromkeys(
            ("integral", "fractional", "boolean", "string", "unknown"), zero
        )
        if is_integral(dt):
            tc["integral"] = nn
        elif is_floating(dt) or isinstance(dt, T.DecimalType):
            tc["fractional"] = nn
        elif isinstance(dt, T.BooleanType):
            tc["boolean"] = nn
        elif isinstance(dt, T.StringType):
            if self.coerce_strings:
                # TypedDataConverter.java:62-84 regex coercion
                i = F.sum(f"{p}__is_int").cast("long")
                fr = F.sum(f"{p}__is_frac").cast("long")
                b = F.sum(f"{p}__is_bool").cast("long")
                tc["integral"], tc["fractional"], tc["boolean"] = i, fr, b
                tc["string"] = (nn - i - fr - b).cast("long")
            else:
                tc["string"] = nn
        else:
            # timestamps/dates/complex: not tracked -> UNKNOWN
            # (TypedData.java:54-57)
            tc["unknown"] = nn
        for k, e in tc.items():
            exprs.append(e.alias(f"{p}_{k}_count"))

        if is_numeric(dt) and not isinstance(dt, T.BooleanType):
            exprs += _num_aggs(f"{p}__num", f"{p}_num")
        else:
            exprs += _null_numeric_atoms(f"{p}_num")
        if isinstance(dt, T.StringType):
            exprs += _num_aggs(f"{p}__len", f"{p}_len")
            exprs += _num_aggs(f"{p}__tok", f"{p}_tok")
        else:
            exprs += _null_numeric_atoms(f"{p}_len")
            exprs += _null_numeric_atoms(f"{p}_tok")
        return exprs

    # -- single-phase atoms (kept for narrow/ad-hoc callers) ---------------
    def atom_exprs(self) -> list[Column]:
        c = F.col(self.name)
        dt = self.dt
        p = self.key
        null_pred = null_predicate(c, dt, self.null_strings)
        m = masked(c, dt, self.null_strings)

        exprs: list[Column] = [
            F.count(F.lit(1)).alias(f"{p}_count"),
            _cnt(null_pred).alias(f"{p}_null_count"),
        ]

        zero = F.lit(0).cast("long")
        nn = F.count(m).cast("long")  # non-(reference-)null occurrences

        if isinstance(dt, T.BooleanType):
            exprs.append(_cnt(m == F.lit(True)).alias(f"{p}_true_count"))
        else:
            exprs.append(F.max(zero).alias(f"{p}_true_count"))

        # type counts (SchemaTracker.typeCounts — SchemaTracker.java:29-31)
        tc = {k: F.max(zero) for k in ("integral", "fractional", "boolean", "string", "unknown")}
        if is_integral(dt):
            tc["integral"] = nn
        elif is_floating(dt) or isinstance(dt, T.DecimalType):
            tc["fractional"] = nn
        elif isinstance(dt, T.BooleanType):
            tc["boolean"] = nn
        elif isinstance(dt, T.StringType):
            if self.coerce_strings:
                # TypedDataConverter.java:62-84 regex coercion
                s = m
                tc["integral"] = _cnt(s.rlike(INTEGRAL_RE))
                tc["fractional"] = _cnt(s.rlike(FRACTIONAL_RE))
                tc["boolean"] = _cnt(s.rlike(BOOLEAN_RE))
                tc["string"] = _cnt(
                    s.isNotNull()
                    & ~s.rlike(INTEGRAL_RE)
                    & ~s.rlike(FRACTIONAL_RE)
                    & ~s.rlike(BOOLEAN_RE)
                )
            else:
                tc["string"] = nn
        else:
            # timestamps/dates/complex: not tracked -> UNKNOWN
            # (TypedData.java:54-57)
            tc["unknown"] = nn
        for k, e in tc.items():
            exprs.append(e.alias(f"{p}_{k}_count"))

        # NumberTracker suite
        if is_numeric(dt) and not isinstance(dt, T.BooleanType):
            exprs += numeric_atom_exprs(m, f"{p}_num")
        else:
            exprs += _null_numeric_atoms(f"{p}_num")

        # StringTracker length + token suites (StringTracker.java:36-37,87-89)
        if isinstance(dt, T.StringType):
            exprs += numeric_atom_exprs(F.length(m), f"{p}_len")
            exprs += numeric_atom_exprs(
                F.size(F.split(m, self.tokenizer_delim)), f"{p}_tok"
            )
        else:
            exprs += _null_numeric_atoms(f"{p}_len")
            exprs += _null_numeric_atoms(f"{p}_tok")
        return exprs

    # -- long-format struct ----------------------------------------------
    def atom_struct(self) -> Column:
        fields = [F.lit(self.name).alias("column_name")]
        for fname, ftype in ATOM_METRICS:
            fields.append(F.col(f"{self.key}_{fname}").cast(ftype).alias(fname))
        return F.struct(*fields)


def _num_projection(d: Column, prefix: str) -> list[Column]:
    """Row-level pieces of one numeric suite: value + hi/lo of x and x²."""
    d2 = d * d
    return [
        d.alias(f"{prefix}_v"),
        F.floor(d).alias(f"{prefix}_hi"),
        F.round((d - F.floor(d)) * 1000000.0, 0).cast("long").alias(f"{prefix}_lo"),
        F.floor(d2).alias(f"{prefix}_hi2"),
        F.round((d2 - F.floor(d2)) * 1000000.0, 0).cast("long").alias(f"{prefix}_lo2"),
    ]


def _num_aggs(in_prefix: str, out_prefix: str) -> list[Column]:
    """Aggregates of a projected numeric suite (plain attribute aggs)."""
    v = F.col(f"{in_prefix}_v")
    return [
        F.count(v).alias(f"{out_prefix}_n"),
        F.min(v).alias(f"{out_prefix}_min"),
        F.max(v).alias(f"{out_prefix}_max"),
        F.sum(f"{in_prefix}_hi").alias(f"{out_prefix}_sum_hi"),
        F.sum(f"{in_prefix}_lo").alias(f"{out_prefix}_sum_lo"),
        F.sum(f"{in_prefix}_hi2").alias(f"{out_prefix}_sum2_hi"),
        F.sum(f"{in_prefix}_lo2").alias(f"{out_prefix}_sum2_lo"),
    ]


def _null_numeric_atoms(prefix: str) -> list[Column]:
    return [
        F.max(F.lit(0)).cast("long").alias(f"{prefix}_n"),
        F.max(F.lit(None).cast("double")).alias(f"{prefix}_min"),
        F.max(F.lit(None).cast("double")).alias(f"{prefix}_max"),
        F.max(F.lit(None).cast("long")).alias(f"{prefix}_sum_hi"),
        F.max(F.lit(None).cast("long")).alias(f"{prefix}_sum_lo"),
        F.max(F.lit(None).cast("long")).alias(f"{prefix}_sum2_hi"),
        F.max(F.lit(None).cast("long")).alias(f"{prefix}_sum2_lo"),
    ]


# ---------------------------------------------------------------------------
# finalization: atoms -> summary metrics (SummaryConverters semantics)
# ---------------------------------------------------------------------------

def finalize_exprs() -> list[Column]:
    """Select-expressions turning a long-format atom row into the summary.

    Output field set mirrors ColumnSummary/NumberSummary/StringSummary
    (core/.../SummaryConverters.java:75-138).
    """
    out: list[Column] = [
        F.col("count"),
        F.col("null_count"),
        F.col("true_count"),
        F.col("integral_count"),
        F.col("fractional_count"),
        F.col("boolean_count"),
        F.col("string_count"),
        F.col("unknown_count"),
        inferred_type_expr(
            F.col("null_count"),
            F.col("fractional_count"),
            F.col("integral_count"),
            F.col("boolean_count"),
            F.col("string_count"),
            F.col("unknown_count"),
        ).alias("inferred_type"),
    ]
    for prefix, out_prefix in (("num", ""), ("len", "len_"), ("tok", "tok_")):
        for name, expr in numeric_final_exprs(prefix, out_prefix).items():
            out.append(expr.alias(name))
    return out
