"""Oracle-SQL portability guards.

The driver's correctness gate fetches DuckDB oracle results through
pandas, where DuckDB's 128-bit aggregate types degrade: an uncast
``SUM(int)`` returns HUGEINT, which ``.df()`` converts to float64 —
so the cell hashes "123.0" against Spark's long "123" and the query
goes driver-red even though ``fetchall()`` (Python ints, what
tools/check_oracle.py uses) compares equal. Round 8 shipped exactly
five such oracles; this module pins that the whole oracle surface
stays free of pandas-lossy output types.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# Output types whose duckdb->pandas conversion is not value-identical
# to the native fetch path: HUGEINT/UHUGEINT -> float64, DECIMAL ->
# float64 (both lose the int-vs-float distinction the driver hashes).
_LOSSY = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield c
    c.close()


def test_no_pandas_lossy_types_in_oracle_output(con):
    """Every oracle's bound output schema must avoid HUGEINT/DECIMAL:
    binding is enough (no execution), so this covers all ~80 oracles
    in well under a second."""
    offenders = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)
        bad = [
            (c, str(ty))
            for c, ty in zip(rel.columns, rel.types)
            if any(str(ty).startswith(p) for p in _LOSSY)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with pandas-lossy output types (cast these to BIGINT / "
        f"DOUBLE in the final projection): {offenders}"
    )


def test_fixed_r8_oracles_emit_bigint(con):
    """The five r8 driver-red queries' integer aggregates now bind as
    BIGINT end-to-end."""
    expect = {
        "split_documents": ["sum_chars"],
        "dedup_segments": ["n_kept", "n_removed"],
        "boilerplate_documents": ["boiler_segments"],
        "corpus_report": ["total_tokens", "suspect_docs"],
        "drift_events_rolling": ["count_cur", "count_prev"],
    }
    oracles = entry_mod.oracle_sql()
    for name, cols in expect.items():
        rel = con.sql(oracles[name])
        types = dict(zip(rel.columns, [str(t) for t in rel.types]))
        for c in cols:
            assert types[c] == "BIGINT", (name, c, types[c])
