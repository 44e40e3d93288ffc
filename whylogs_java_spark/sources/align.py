"""Schema-evolution-tolerant multi-source union.

Real corpora arrive from many exporters whose schemas drift: a column
appears in one source and not another, or the same column lands as INT
in one parquet generation and DOUBLE in the next. A naive ``unionByName``
either throws (missing columns) or silently keeps conflicting types from
resolving. This module makes the reconciliation EXPLICIT:

- ``schema_report(dfs, names)`` — one row per (source, column) with the
  source's dtype, the reconciled corpus dtype, and a status
  (``ok`` / ``cast`` / ``missing``): the audit a pipeline logs before
  unioning a new export generation.
- ``align_union(dfs, names)`` — the corpus itself: every frame projected
  to the union of columns (missing -> typed NULLs), conflicting types
  widened along the numeric ladder (int -> bigint -> double; anything
  irreconcilable -> string, the lossless common denominator), plus a
  ``source`` tag column.

Scale: pure metadata work on the driver (schemas are O(columns)) + one
cast/NULL-fill projection per input — no shuffle beyond the union scan
itself; Catalyst pushes the projections into each source's scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ckpt import literal_df

# widening ladder: left-to-right = narrower-to-wider
_NUMERIC_LADDER = [
    "tinyint", "smallint", "int", "bigint", "float", "double",
]


def _reconcile(types: list[str]) -> str:
    """Widest common type for one column across sources."""
    distinct = sorted(set(types))
    if len(distinct) == 1:
        return distinct[0]
    if all(t in _NUMERIC_LADDER for t in distinct):
        return max(distinct, key=_NUMERIC_LADDER.index)
    # mixed families (e.g. string vs int, array vs scalar): string is
    # the lossless common denominator for scalars; otherwise refuse
    # loudly rather than corrupt
    scalars = {"string", "boolean", "date", "timestamp", *_NUMERIC_LADDER}
    if all(t in scalars for t in distinct):
        return "string"
    raise ValueError(
        f"cannot reconcile column types {distinct}; align the sources "
        "explicitly before union"
    )


def _plan(dfs: list[DataFrame]) -> dict[str, str]:
    """column -> reconciled dtype over the union of all source columns,
    in first-seen order."""
    cols: dict[str, list[str]] = {}
    for df in dfs:
        for name, dtype in df.dtypes:
            cols.setdefault(name, []).append(dtype)
    return {name: _reconcile(ts) for name, ts in cols.items()}


def schema_report(
    dfs: list[DataFrame], names: list[str] | None = None
) -> DataFrame:
    """Per-(source, column) reconciliation audit: (source, column,
    dtype, target_dtype, status) with status ok | cast | missing."""
    if not dfs:
        raise ValueError("need at least one DataFrame")
    names = names or [f"src{i}" for i in range(len(dfs))]
    if len(names) != len(dfs):
        raise ValueError("names must match dfs")
    plan = _plan(dfs)
    rows = []
    for name, df in zip(names, dfs):
        have = dict(df.dtypes)
        for col, target in plan.items():
            if col not in have:
                rows.append((name, col, None, target, "missing"))
            elif have[col] != target:
                rows.append((name, col, have[col], target, "cast"))
            else:
                rows.append((name, col, have[col], target, "ok"))
    return literal_df(
        dfs[0].sparkSession,
        rows, "source string, column string, dtype string, "
        "target_dtype string, status string"
    )


def align_union(
    dfs: list[DataFrame],
    names: list[str] | None = None,
    source_col: str = "source",
) -> DataFrame:
    """Union all sources under the reconciled schema, tagging each row
    with its source name in ``source_col``."""
    if not dfs:
        raise ValueError("need at least one DataFrame")
    names = names or [f"src{i}" for i in range(len(dfs))]
    if len(names) != len(dfs):
        raise ValueError("names must match dfs")
    plan = _plan(dfs)
    if source_col in plan:
        raise ValueError(
            f"source_col {source_col!r} collides with a data column"
        )
    out = None
    for name, df in zip(names, dfs):
        have = dict(df.dtypes)
        cols = [
            (
                F.col(c).cast(t) if c in have else F.lit(None).cast(t)
            ).alias(c)
            for c, t in plan.items()
        ]
        part = df.select(*cols, F.lit(name).alias(source_col))
        out = part if out is None else out.unionByName(part)
    return out
