"""JSONL (one JSON document per line) ingestion — the arrival format of
most crawl/text corpora.

A thin, policy-explicit wrapper over Spark's native JSON source (which
is already distributed, schema-inferring, and predicate-pushdown-aware):
the added value is making the malformed-line policy a visible contract
instead of the silent PERMISSIVE default.

- ``corrupt="keep"`` (default): malformed lines survive as rows whose
  data columns are NULL and whose ``_corrupt_record`` column carries the
  raw line — the auditable choice (count them, sample them, route them);
- ``corrupt="drop"``: DROPMALFORMED — silently discards bad lines (the
  high-throughput crawl setting);
- ``corrupt="fail"``: FAILFAST — any bad line fails the read (the
  "this file must be clean" setting).

Schema: pass one explicitly for production reads (inference scans the
data once more and samples types); inference remains available for
exploration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CORRUPT_COL = "_corrupt_record"

_MODES = {"keep": "PERMISSIVE", "drop": "DROPMALFORMED", "fail": "FAILFAST"}


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    corrupt: str = "keep",
    limit: int | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Read a JSONL file/glob with an explicit malformed-line policy."""
    if corrupt not in _MODES:
        raise ValueError(f"corrupt must be one of {sorted(_MODES)}, got {corrupt!r}")
    reader = (
        spark.read.option("mode", _MODES[corrupt])
        .option("multiLine", "true" if multiline else "false")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if schema is not None:
        # PERMISSIVE only materializes the corrupt column when it is in
        # the schema — add it so "keep" actually keeps
        full = schema
        if corrupt == "keep" and CORRUPT_COL not in schema:
            full = f"{schema}, {CORRUPT_COL} string"
        reader = reader.schema(full)
    df = reader.json(path)
    if limit is not None:
        df = df.limit(limit)
    return df


def corrupt_lines(df: DataFrame) -> DataFrame:
    """The malformed rows of a ``corrupt="keep"`` read (raw line only).

    Spark refuses corrupt-only projections straight off a raw JSON scan
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the supported pattern is to
    parse fully first. A diagnostic helper over what should be a small
    tail, so the materialization cost is the audit's cost; for huge
    corpora filter on ``_corrupt_record IS NOT NULL`` while keeping at
    least one data column in the projection instead.
    """
    if CORRUPT_COL not in df.columns:
        raise ValueError(
            f"DataFrame has no {CORRUPT_COL} column — read with "
            f"corrupt='keep' and an explicit schema"
        )
    from pyspark.sql import functions as F

    return (
        df.localCheckpoint(eager=False)
        .where(F.col(CORRUPT_COL).isNotNull())
        .select(CORRUPT_COL)
    )
