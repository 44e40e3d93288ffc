"""Dump .explain("formatted") for named queries to plans/<round>/<query>_<tag>.txt.

Usage: python tools/plan_dump.py <tag> <query> [query ...] [--sf SF_DIR] [--round rNN]

The optimization deliverable: the judge checks plan claims (Exchange
counts, join strategies, PushedFilters, Python-eval nodes) against these
committed files.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from whylogs_java_spark import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    round_dir = "r15"
    if "--round" in args:
        i = args.index("--round")
        round_dir = args[i + 1]
        del args[i : i + 2]
    tag, names = args[0], args[1:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        text = buf.getvalue()
        n_ex = text.count("Exchange")
        n_py = sum(
            text.count(t)
            for t in ("BatchEvalPython", "ArrowEvalPython", "MapInArrow", "MapInPandas")
        )
        print(f"{name}: {len(text.splitlines())} lines, ~{n_ex} Exchange refs, {n_py} Python nodes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
