"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` on a chosen
sf dir: compares row count, sorted column names, and order-insensitive
stringified values. Reports per-query PASS/FAIL with first diffs.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            f = float(v)
            return norm_cell(f)
    except Exception:
        pass
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from whylogs_java_spark import get_spark

    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(srows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"[FAIL] {name}: oracle error: {e}")
            failures += 1
            continue

        ok = True
        if sorted(scols) != sorted(ocols):
            print(f"[FAIL] {name}: columns differ\n  spark:  {sorted(scols)}\n  oracle: {sorted(ocols)}")
            ok = False
        elif len(srows) != len(orows):
            print(f"[FAIL] {name}: row count {len(srows)} vs {len(orows)}")
            ok = False
        else:
            a = norm_rows(scols, srows)
            b = norm_rows(ocols, orows)
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y]
                print(f"[FAIL] {name}: {len(diffs)} differing rows of {len(a)}")
                names_sorted = sorted(scols)
                for x, y in diffs[:3]:
                    for col, xv, yv in zip(names_sorted, x, y):
                        if xv != yv:
                            print(f"    col={col}: spark={xv} oracle={yv}")
                    print("    ---")
                ok = False
        if ok:
            print(f"[PASS] {name}: {len(srows)} rows")
        else:
            failures += 1
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
