"""Property-based tests (hypothesis): profile statistics vs numpy on
adversarial value mixes, and merge associativity."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whylogs_java_spark import (
    finalize_profile,
    merge_profile_atoms,
    profile,
    profile_atoms,
)

values = st.lists(
    st.one_of(
        st.none(),
        st.floats(
            min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
        ),
        st.just(float("nan")),
        st.just(float("inf")),
        st.just(float("-inf")),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(values)
def test_profile_stats_match_numpy(spark, xs):
    df = spark.createDataFrame([(float(x) if x is not None else None,) for x in xs], "x double")
    r = {row["column_name"]: row for row in profile(df).collect()}["x"]
    clean = np.array(
        [x for x in xs if x is not None and math.isfinite(x)], dtype=np.float64
    )
    assert r["count"] == len(xs)
    assert r["null_count"] == len(xs) - len(clean)
    assert r["n"] == len(clean)
    if len(clean):
        assert r["min"] == clean.min() and r["max"] == clean.max()
        # engine quantizes fractional parts at 1e-6 per value: the sum error
        # bound is 0.5e-6 * n (+ output rounding)
        assert r["sum"] == pytest.approx(clean.sum(), abs=5e-7 * len(clean) + 1e-6, rel=1e-9)
        assert r["mean"] == pytest.approx(clean.mean(), abs=1e-6, rel=1e-9)
    if len(clean) > 1:
        assert r["variance"] == pytest.approx(
            clean.var(ddof=1), rel=1e-6, abs=1e-4
        )
    else:
        assert r["variance"] == (0.0 if len(clean) == 1 else None)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=3,
        max_size=40,
    )
)
def test_merge_split_invariance(spark, rows):
    """Profiling any 2-way split then merging equals profiling the whole —
    the central mergeability invariant (DatasetProfile.merge)."""
    df = spark.createDataFrame([(int(k), float(v)) for k, v in rows], "k int, v double")
    whole = {
        (r["k"], r["column_name"]): (r["count"], r["sum"], r["variance"])
        for r in profile(df, group_by=["k"]).collect()
    }
    a = profile_atoms(df.where("v >= 0"), group_by=["k"])
    b = profile_atoms(df.where("v < 0"), group_by=["k"])
    merged = finalize_profile(merge_profile_atoms(a.unionByName(b), ["k"]), ["k"])
    got = {
        (r["k"], r["column_name"]): (r["count"], r["sum"], r["variance"])
        for r in merged.collect()
    }
    assert got == whole


# ---------------------------------------------------------------------------
# wire chunk packing (pure python, no Spark)
# ---------------------------------------------------------------------------

@given(
    st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=4000),
)
def test_greedy_chunk_packing_invariants(sizes, cap):
    from whylogs_java_spark.sources.protobuf import _greedy_chunks

    items = [bytes(n % 251 for _ in range(n)) for n in sizes]
    chunks = _greedy_chunks(items, cap)
    # order + content preserved exactly
    assert [i for c in chunks for i in c] == items
    for c in chunks:
        assert c  # no empty chunks
        # within cap unless a single oversized item
        assert len(c) == 1 or sum(len(i) for i in c) <= cap
    # maximality: no chunk could absorb its successor's head
    for a, b in zip(chunks, chunks[1:]):
        assert sum(len(i) for i in a) + len(b[0]) > cap
