"""Per-job trace for named queries: every Spark job's wall time, task
count, and description, in submission order — the driver-action audit
(guide §5) that shows WHICH serialized actions a construct-bound query
spends its time in.

Usage: python tools/job_trace.py [--sf SF_DIR] <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from whylogs_java_spark import get_spark  # noqa: E402


def _ts(s: str) -> float:
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    args = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    spark = get_spark("job-trace", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId
    qs = entry_mod.queries()
    for name in names:
        before = {
            j["jobId"]
            for j in json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
            )
        }
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        jobs = [
            j
            for j in json.load(
                urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs")
            )
            if j["jobId"] not in before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(
            f"== {name}: construct {t1-t0:.2f}s exec {t2-t1:.2f}s "
            f"total {t2-t0:.2f}s, {len(jobs)} jobs"
        )
        prev_end = None
        for j in jobs:
            sub, comp = _ts(j["submissionTime"]), _ts(j["completionTime"])
            gap = f" gap={sub-prev_end:5.2f}s" if prev_end is not None else ""
            prev_end = comp
            print(
                f"  job {j['jobId']:>4} wall={comp-sub:6.2f}s{gap} "
                f"tasks={j['numCompletedTasks']:>4} "
                f"{(j.get('description') or j['name'])[:90]}"
            )


if __name__ == "__main__":
    main()
