"""Column-type inference: the SchemaTracker decision tree as expressions.

Reproduces SchemaTracker.getInferredType (core/.../SchemaTracker.java:41-105)
over per-type counts. The tree (totalCount includes NULL and UNKNOWN):

1. total == 0                      -> UNKNOWN
2. most-popular ratio > 0.7        -> that type
3. candidate STRING and
   string_count > int+frac         -> STRING (coerced ratio)
4. candidate ratio > 0.5           -> candidate (FRACTIONAL absorbs INTEGRAL,
                                      SchemaTracker.java:84-86)
5. (int+frac)/total > 0.5          -> FRACTIONAL
6. else                            -> UNKNOWN

Deviation from the reference: ties in "most popular" are HashMap-iteration-
order-dependent in Java (SchemaTracker.java:135-138); here ties break by the
fixed priority STRING > FRACTIONAL > INTEGRAL > BOOLEAN > NULL > UNKNOWN so
results are deterministic.

Both a PySpark Column builder and a SQL-text builder are provided so the
Spark plan and the DuckDB oracle use literally the same logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import (
    TYPE_BOOLEAN,
    TYPE_FRACTIONAL,
    TYPE_INTEGRAL,
    TYPE_NULL,
    TYPE_STRING,
    TYPE_UNKNOWN,
)

# tie-break priority: later entries win ties (stable argmax via strict >)
_PRIORITY = [TYPE_UNKNOWN, TYPE_NULL, TYPE_BOOLEAN, TYPE_INTEGRAL, TYPE_FRACTIONAL, TYPE_STRING]


def inferred_type_expr(
    null_count: Column,
    fractional_count: Column,
    integral_count: Column,
    boolean_count: Column,
    string_count: Column,
    unknown_count: Column,
) -> Column:
    counts = {
        TYPE_NULL: null_count,
        TYPE_FRACTIONAL: fractional_count,
        TYPE_INTEGRAL: integral_count,
        TYPE_BOOLEAN: boolean_count,
        TYPE_STRING: string_count,
        TYPE_UNKNOWN: unknown_count,
    }
    total = sum(counts.values(), F.lit(0)).cast("double")

    # argmax with fixed tie-break: walk priority order, keep strictly-greater
    cand_type = F.lit(_PRIORITY[0])
    cand_count = counts[_PRIORITY[0]]
    for t in _PRIORITY[1:]:
        is_ge = counts[t] >= cand_count
        cand_type = F.when(is_ge, F.lit(t)).otherwise(cand_type)
        cand_count = F.when(is_ge, counts[t]).otherwise(cand_count)

    frac_plus_int = counts[TYPE_FRACTIONAL] + counts[TYPE_INTEGRAL]

    return (
        F.when(total == 0, F.lit(TYPE_UNKNOWN))
        .when(cand_count / total > 0.7, cand_type)
        .when(
            (cand_type == TYPE_STRING) & (counts[TYPE_STRING] > frac_plus_int),
            F.lit(TYPE_STRING),
        )
        .when(
            (cand_count / total > 0.5) & (cand_type == TYPE_FRACTIONAL),
            F.lit(TYPE_FRACTIONAL),
        )
        .when(cand_count / total > 0.5, cand_type)
        .when(frac_plus_int / total > 0.5, F.lit(TYPE_FRACTIONAL))
        .otherwise(F.lit(TYPE_UNKNOWN))
    )


def inferred_type_sql(
    null_count: str,
    fractional_count: str,
    integral_count: str,
    boolean_count: str,
    string_count: str,
    unknown_count: str,
) -> str:
    """ANSI-SQL text of the same decision tree, for DuckDB oracles.

    Arguments are SQL expressions (typically aggregate aliases) for the six
    per-type counts.
    """
    c = {
        TYPE_NULL: null_count,
        TYPE_FRACTIONAL: fractional_count,
        TYPE_INTEGRAL: integral_count,
        TYPE_BOOLEAN: boolean_count,
        TYPE_STRING: string_count,
        TYPE_UNKNOWN: unknown_count,
    }
    total = " + ".join(c.values())
    # candidate count = greatest; candidate type via the same priority walk
    greatest = f"GREATEST({', '.join(c.values())})"
    # choose the highest-priority type attaining the max
    cand_type = f"""CASE
        WHEN {c[TYPE_STRING]} = {greatest} THEN '{TYPE_STRING}'
        WHEN {c[TYPE_FRACTIONAL]} = {greatest} THEN '{TYPE_FRACTIONAL}'
        WHEN {c[TYPE_INTEGRAL]} = {greatest} THEN '{TYPE_INTEGRAL}'
        WHEN {c[TYPE_BOOLEAN]} = {greatest} THEN '{TYPE_BOOLEAN}'
        WHEN {c[TYPE_NULL]} = {greatest} THEN '{TYPE_NULL}'
        ELSE '{TYPE_UNKNOWN}' END"""
    frac_int = f"({c[TYPE_FRACTIONAL]} + {c[TYPE_INTEGRAL]})"
    return f"""CASE
      WHEN ({total}) = 0 THEN '{TYPE_UNKNOWN}'
      WHEN {greatest} / CAST(({total}) AS DOUBLE) > 0.7 THEN {cand_type}
      WHEN ({cand_type}) = '{TYPE_STRING}' AND {c[TYPE_STRING]} > {frac_int} THEN '{TYPE_STRING}'
      WHEN {greatest} / CAST(({total}) AS DOUBLE) > 0.5 THEN {cand_type}
      WHEN {frac_int} / CAST(({total}) AS DOUBLE) > 0.5 THEN '{TYPE_FRACTIONAL}'
      ELSE '{TYPE_UNKNOWN}' END"""
