"""sf0.01 -> sf0.1 scaling exponents for entry queries.

Times each named query (default: the r6/r7 temporal-join + drift +
sampling family) at two scale factors with the bench.py conventions
(noop sink, best-of-2 after a warmup) and prints one JSON line with
per-query seconds and the observed time ratio. Data volume grows 10x
between the two sfs, so a ratio near (or below) 10 is at-most-linear
scaling; well below 10 means fixed costs still dominate at sf0.1.

  python tools/sf_scaling.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from whylogs_java_spark import get_spark

DEFAULT_QUERIES = [
    "asof_events",
    "range_bands",
    "overlap_lineitem",
    "weighted_sample_documents",
    "drift_events_value",
    "drift_events_rolling",
    "profile_diff_lineitem",
    "profile_diff_sketch",
    # r7/r8 dedup/SemDeDup/ANN family (round-9 extension, SCALE.md)
    "dedup_simhash_pairs",
    "dedup_semantic",
    "dedup_semantic_survivors",
    "cluster_embeddings_k64",
    "similarity_ivf_int8",
]

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


def _timed(qs, name: str, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("sf-scaling")
    qs = entry_mod.queries()
    # warm plan shapes at the smallest sf (bench.py convention)
    for n in names:
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out = {}
    for n in names:
        small = _timed(qs, n, spark, SF_SMALL)
        big = _timed(qs, n, spark, SF_BIG)
        out[n] = {
            "sf0.01_sec": small,
            "sf0.1_sec": big,
            "ratio": round(big / small, 2) if small > 0 else None,
        }
    print(json.dumps({"probe": "sf_scaling", "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
