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

Mergeability: we aggregate *atoms* — counts, min, max, exact decimal sums of
x and x² (and of derived length/token-count columns). Two profiles merge by
summing counts/sums and min/max-ing extremes, exactly the algebra of
DatasetProfile.merge (DatasetProfile.java:251-300) and Chan's variance
combine (VarianceTracker.java:49-69) re-expressed on (n, Σx, Σx²).

Determinism note: floating sums use exact DECIMAL(38,6) accumulation, which
is order-independent and reproduces bit-identically in DuckDB oracles; all
derived doubles (mean/variance/stddev) are computed from those exact atoms
with the same double arithmetic on both engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import ROUND_DIGITS, SUM_DECIMAL, TOKEN_DELIMITER
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
    """Exact order-independent sum of doubles, split hi/lo.

    ``hi`` accumulates floor(x) in DECIMAL(38,0) and ``lo`` the fractional
    remainder in DECIMAL(38,6). Keeping the integer part at scale 0 keeps
    the accumulated unscaled value far below 2^53, so the final
    decimal->double conversions are exact (hence bit-identical across
    engines) even for second moments of large-magnitude columns.
    """
    hi = F.floor(d).cast("decimal(38,0)")
    lo = (d - F.floor(d)).cast(SUM_DECIMAL)
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
    sx = F.col(f"{row_prefix}_sum_hi").cast("double") + F.col(f"{row_prefix}_sum_lo").cast("double")
    sx2 = F.col(f"{row_prefix}_sum2_hi").cast("double") + F.col(f"{row_prefix}_sum2_lo").cast("double")
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
        f"SUM(CAST(FLOOR({d}) AS DECIMAL(38,0))) AS {prefix}_sum_hi, "
        f"SUM(CAST({d} - FLOOR({d}) AS DECIMAL(38,6))) AS {prefix}_sum_lo, "
        f"SUM(CAST(FLOOR({d2}) AS DECIMAL(38,0))) AS {prefix}_sum2_hi, "
        f"SUM(CAST({d2} - FLOOR({d2}) AS DECIMAL(38,6))) AS {prefix}_sum2_lo"
    )


def numeric_final_sql(row_prefix: str, out_prefix: str = "") -> str:
    n = f"{row_prefix}_n"
    sx = f"(CAST({row_prefix}_sum_hi AS DOUBLE) + CAST({row_prefix}_sum_lo AS DOUBLE))"
    sx2 = f"(CAST({row_prefix}_sum2_hi AS DOUBLE) + CAST({row_prefix}_sum2_lo AS DOUBLE))"
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
    ("num_sum_hi", "decimal(38,0)"),
    ("num_sum_lo", SUM_DECIMAL),
    ("num_sum2_hi", "decimal(38,0)"),
    ("num_sum2_lo", SUM_DECIMAL),
    ("len_n", "long"),
    ("len_min", "double"),
    ("len_max", "double"),
    ("len_sum_hi", "decimal(38,0)"),
    ("len_sum_lo", SUM_DECIMAL),
    ("len_sum2_hi", "decimal(38,0)"),
    ("len_sum2_lo", SUM_DECIMAL),
    ("tok_n", "long"),
    ("tok_min", "double"),
    ("tok_max", "double"),
    ("tok_sum_hi", "decimal(38,0)"),
    ("tok_sum_lo", SUM_DECIMAL),
    ("tok_sum2_hi", "decimal(38,0)"),
    ("tok_sum2_lo", SUM_DECIMAL),
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

    # -- atoms ------------------------------------------------------------
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


def _null_numeric_atoms(prefix: str) -> list[Column]:
    return [
        F.max(F.lit(0)).cast("long").alias(f"{prefix}_n"),
        F.max(F.lit(None).cast("double")).alias(f"{prefix}_min"),
        F.max(F.lit(None).cast("double")).alias(f"{prefix}_max"),
        F.max(F.lit(None).cast("decimal(38,0)")).alias(f"{prefix}_sum_hi"),
        F.max(F.lit(None).cast(SUM_DECIMAL)).alias(f"{prefix}_sum_lo"),
        F.max(F.lit(None).cast("decimal(38,0)")).alias(f"{prefix}_sum2_hi"),
        F.max(F.lit(None).cast(SUM_DECIMAL)).alias(f"{prefix}_sum2_lo"),
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
