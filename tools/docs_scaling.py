"""Next-decade scaling probe for the token-explode-bound query family.

The steepest sf0.01→sf0.1 exponents in SCALE.md belong to the queries
whose cost is O(corpus tokens) — tfidf / DSIR / corpus-overlap / span
dedup / winnowing. There is no sf1 documents fixture, so this probe
SYNTHESIZES one: the sf0.1 corpus unioned with 9 deterministic mutated
copies (every word of copy k suffixed ``~s{k}``), i.e. a corpus with

- 10× the rows and tokens,
- ~10× the vocabulary (each copy's token space is disjoint by
  construction — the "different shard of the web" model, so broadcast
  vocabulary tables genuinely grow instead of deduping away),
- NO cross-copy near-duplicate structure (every shingle/print differs),
  so pair outputs scale with the corpus, not quadratically with the
  copy count — the probe measures operator scaling, not planted-dup
  explosion; each copy preserves the original intra-corpus structure,
  so the queries' own planted mutants/fragments replicate ×10.

Build is deterministic (pure column expressions, fixed offsets) and
cached under /tmp; per-query timings use bench.py conventions (noop
sink, best-of-2 after warmup). A ratio near 10 is linear; the SCALE.md
bar for this family is ratio ≤ ~12 (1.2× linear).

  python tools/docs_scaling.py [query ...]
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
    "tfidf_documents",
    "dsir_documents",
    "corpus_overlap",
    "dedup_spans_documents",
    "winnow_pairs",
]

SF_BASE = "/root/testdata/sf0.1"
FIXTURE_DIR = "/tmp/sf1docs_fixture"
N_COPIES = 10  # 1 identity + 9 mutated
# clear of every planted-query offset (they add up to +500000 to ids)
COPY_OFFSET = 10_000_000


def build_fixture(
    spark,
    base_dir: str = SF_BASE,
    out_dir: str = FIXTURE_DIR,
    n_copies: int = N_COPIES,
):
    """documents.parquet = base ∪ (n_copies-1) fully-word-mutated
    copies (cached). n_copies=100 stacks a second decade on the same
    disjoint-vocabulary model (the r13 verdict's 100× ask)."""
    from pyspark.sql import functions as F

    out = f"{out_dir}/documents.parquet"
    if os.path.exists(out):
        return out_dir
    d = spark.read.parquet(f"{base_dir}/documents.parquet")
    other = [c for c in d.columns if c not in ("doc_id", "text")]
    parts = [d]
    for k in range(1, n_copies):
        parts.append(
            d.select(
                (F.col("doc_id") + k * COPY_OFFSET).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.filter(F.split("text", " "), lambda t: t != ""),
                        lambda w: F.concat(w, F.lit(f"~s{k}")),
                    ),
                ).alias("text"),
                *[F.col(c) for c in other],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32 if n_copies <= 10 else 128).write.mode(
        "overwrite"
    ).parquet(out)
    return out_dir


def build_embeddings_fixture(
    spark, base_dir: str = SF_BASE, out_dir: str = FIXTURE_DIR
):
    """embeddings.parquet = base ∪ 9 id-offset copies (10× vectors).
    Vectors are kept verbatim — k-means/ANN cost is O(rows × k × dim)
    with no dedup shortcut, so the probe measures row scaling; ids stay
    disjoint via the same COPY_OFFSET as the documents fixture."""
    from pyspark.sql import functions as F

    out = f"{out_dir}/embeddings.parquet"
    if os.path.exists(out):
        return out_dir
    e = spark.read.parquet(f"{base_dir}/embeddings.parquet")
    other = [c for c in e.columns if c != "vec_id"]
    parts = [e]
    for k in range(1, N_COPIES):
        parts.append(
            e.select(
                (F.col("vec_id") + k * COPY_OFFSET).alias("vec_id"),
                *[F.col(c) for c in other],
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(out)
    return out_dir


def _timed(qs, name: str, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    args = sys.argv[1:]
    stack = "--stack" in args
    if stack:
        args.remove("--stack")
    names = args or DEFAULT_QUERIES
    spark = get_spark("docs-scaling")
    if stack:
        # two stacked decades: base -> 10x -> 100x; the second-decade
        # ratio is the honest linearity read (the constant term is
        # already amortized at 10x, so ~10 = linear, >>10 = a hidden
        # super-linear stage)
        f10 = build_fixture(spark)
        f100 = build_fixture(
            spark, out_dir="/tmp/sf10docs_fixture", n_copies=100
        )
        qs = entry_mod.queries()
        for n in names:
            qs[n](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        out = {}
        for n in names:
            t1 = _timed(qs, n, spark, SF_BASE)
            t10 = _timed(qs, n, spark, f10)
            t100 = _timed(qs, n, spark, f100)
            out[n] = {
                "sf0.1_sec": t1, "x10_sec": t10, "x100_sec": t100,
                "ratio_d1": round(t10 / t1, 2),
                "ratio_d2": round(t100 / t10, 2),
            }
            print(f"# {n}: {t1}s -> {t10}s -> {t100}s "
                  f"(d1 x{out[n]['ratio_d1']}, d2 x{out[n]['ratio_d2']})",
                  file=sys.stderr)
        print(json.dumps({"probe": "docs_scaling_100x", "runs": out}))
        spark.stop()
        return
    fixture = build_fixture(spark)
    if any("embedding" in n or "cluster" in n or n.startswith(("similarity", "knn", "ann", "prune", "quantize", "rp_")) for n in names):
        build_embeddings_fixture(spark)
    qs = entry_mod.queries()
    for n in names:  # warm plan shapes at the smallest sf
        qs[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    out = {}
    for n in names:
        small = _timed(qs, n, spark, SF_BASE)
        big = _timed(qs, n, spark, fixture)
        out[n] = {
            "sf0.1_sec": small,
            "sf1docs_sec": big,
            "ratio": round(big / small, 2) if small > 0 else None,
        }
        print(f"# {n}: {small}s -> {big}s (x{out[n]['ratio']})", file=sys.stderr)
    print(json.dumps({"probe": "docs_scaling_10x", "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
