"""CLI entry point — the engine's equivalent of the reference's picocli
``Profiler`` command (cli/src/main/java/com/whylogs/cli/Profiler.java:
read CSV with optional datetime parsing and row limit, profile, emit
profiles). Output formats:

- ``parquet``: mergeable atom rows (the durable second-phase-merge form)
- ``json``: finalized per-(group, column) summary, one JSON object per row
  (Profiler.java:150-168 / ProfileViewer.java:78-97 shape)
- ``bin``: wire-compatible delimited DatasetProfileMessage stream readable
  by any whylogs client (DatasetProfile.java:302-368)

Usage:
  python -m whylogs_java_spark INPUT -o OUT [--format parquet|json|bin]
      [--input-format csv|parquet] [--group-by col[,col]]
      [--time-column col --granularity day] [--datetime-col col
      --datetime-format fmt] [--limit N] [--null-strings NA,null]
      [--coerce-strings] [--session-id ID]
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m whylogs_java_spark",
        description="Profile a CSV/parquet dataset (whylogs-style).",
    )
    p.add_argument("input", help="input file or glob")
    p.add_argument("-o", "--output", required=True, help="output path")
    p.add_argument("--format", choices=["parquet", "json", "bin"], default="parquet")
    p.add_argument("--input-format", choices=["csv", "parquet"], default=None)
    p.add_argument("--group-by", default="", help="comma-separated group columns")
    p.add_argument("--time-column", default=None)
    p.add_argument("--granularity", default="day")
    p.add_argument("--datetime-col", default=None, help="CSV column to parse as datetime")
    p.add_argument("--datetime-format", default=None, help="Java datetime pattern")
    p.add_argument("--limit", type=int, default=None, help="row limit (Profiler -limit)")
    p.add_argument("--delimiter", default=",")
    p.add_argument("--null-strings", default="", help="comma-separated null strings")
    p.add_argument("--coerce-strings", action="store_true",
                   help="enable TypedDataConverter string matching")
    p.add_argument("--session-id", default="whylogs-java-spark-cli")
    p.add_argument(
        "--chunk-bytes", type=int, default=None,
        help="with --format bin: emit <=N-byte column chunks per group "
             "(the reference's ~1MB segment stream; merge-to-whole on read)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .operators.profile import profile_atoms
    from .session import get_spark
    from .sources.csv import read_csv
    from .sources.protobuf import write_profile_bin
    from .sources.sinks import write_profile_atoms, write_profile_summary_json

    in_fmt = args.input_format or (
        "parquet" if args.input.endswith(".parquet") else "csv"
    )
    group_by = [c for c in args.group_by.split(",") if c]
    null_strings = [s for s in args.null_strings.split(",") if s]

    spark = get_spark("whylogs-cli")
    try:
        if in_fmt == "csv":
            df = read_csv(
                spark, args.input, delimiter=args.delimiter,
                datetime_column=args.datetime_col,
                datetime_format=args.datetime_format, limit=args.limit,
            )
        else:
            df = spark.read.parquet(args.input)
            if args.limit is not None:
                df = df.limit(args.limit)

        if args.format == "bin":
            n = write_profile_bin(
                df, args.output, group_by=group_by, session_id=args.session_id,
                session_timestamp=int(time.time() * 1000),
                null_strings=null_strings, chunk_bytes=args.chunk_bytes,
            )
            print(f"wrote {n} profile message(s) to {args.output}")
            return 0

        atoms = profile_atoms(
            df, group_by=group_by, time_column=args.time_column,
            time_granularity=args.granularity, null_strings=null_strings,
            coerce_strings=args.coerce_strings,
        )
        key_names = list(group_by) + (["dataset_timestamp"] if args.time_column else [])
        if args.format == "parquet":
            write_profile_atoms(atoms, args.output)
        else:
            write_profile_summary_json(atoms, key_names, args.output)
        print(f"wrote {args.format} profile to {args.output}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
