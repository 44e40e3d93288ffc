"""Per-query cost probe: wall seconds, DataFrame-construction seconds,
and Spark job count (driver round-trips) for named queries.

Usage: python tools/opt_probe.py [--sf SF_DIR] [--runs N] <query> [query ...]

Construction time covers everything before the noop write — store
builds, collects, checkpoints, plan building. Job count separates
"many driver round-trips" queries from "one heavy plan" queries, which
is the first fork in the optimization playbook (guide §1/§5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from whylogs_java_spark import get_spark  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    runs = 2
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    names = args
    spark = get_spark("opt-probe")
    sc = spark.sparkContext
    qs = entry_mod.queries()
    out = {}
    for name in names:
        best = None
        for r in range(runs):
            group = f"probe-{name}-{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            rec = {
                "total_s": round(t2 - t0, 3),
                "construct_s": round(t1 - t0, 3),
                "jobs": jobs,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        print(f"{name}: {json.dumps(best)}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
