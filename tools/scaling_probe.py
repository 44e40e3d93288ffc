"""10x scaling probe for the dedup/ANN family.

Builds 1x and 10x corpora from $SPARK_GRAFT_SF_DIR (default sf0.1) and
times the three heavy near-dup pipelines on each:

- near_dup  — MinHash-LSH verified pairs (``near_dup_pairs``)
- clusters  — pairs -> connected components (``near_dup_clusters``)
- emb_fast  — banded+capped embedding pair dedup
              (``cosine_pairs_bucketed`` double tier)

Replicas are DISTINCT from their sources — every word carries a replica
suffix, embeddings are cyclically shifted by the replica index — so the
dup-pair density per document stays constant and the workload scales
linearly. A naive replicate-verbatim 10x corpus would instead create a
10-way near-dup clique per document (pair count grows 45x per family),
measuring an artificial dup blow-up rather than engine scaling.

Each timed run writes to the noop sink (no collect, no output cost —
same convention as bench.py). Shuffle read/write bytes come from the
Spark UI REST API (/api/v1/.../stages), summed over the stages that ran
during the query. Prints one JSON line:

  {"probe": "dedup_scaling", "runs": [{"query", "scale", "input_rows",
   "sec", "rows_per_sec", "shuffle_read_mb", "shuffle_write_mb"}, ...]}
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from whylogs_java_spark import get_spark
from whylogs_java_spark.operators.dedup import (
    near_dup_clusters,
    near_dup_pairs,
    segment_dedup,
)
from whylogs_java_spark.operators.similarity import cosine_pairs_bucketed

REPLICA_STRIDE = 10_000_000
EMB_DIM = None  # discovered from data


def _mutated_docs(d: DataFrame) -> DataFrame:
    """documents ∪ near-dup mutants of every 10th doc (the
    dedup_near_documents corpus construction)."""
    mut = d.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra token")).alias("text"),
    )
    return d.unionByName(mut)


def _mutated_embeddings(emb: DataFrame) -> DataFrame:
    mut = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(0.9) + F.lit(0.01)).cast("float")
        ).alias("embedding"),
    )
    return emb.unionByName(mut)


def _suffixer(r: int):
    return lambda w: F.concat(w, F.lit(f"~{r}"))


def _replicate_docs(d: DataFrame, replicas: int) -> DataFrame:
    """Replica r: ids shifted by r*stride, every word suffixed with ~r
    (r=0 verbatim) — shingle sets map bijectively, so within-replica dup
    structure mirrors the original and cross-replica Jaccard is 0."""
    parts = [d]
    for r in range(1, replicas):
        parts.append(
            d.select(
                (F.col("doc_id") + r * REPLICA_STRIDE).alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        # MUST be a one-parameter lambda: a `w, r=r` default
                        # is read by PySpark as an (element, index) binary
                        # lambda, feeding the index column into the f-string.
                        # Safe as a plain closure — F.transform invokes it
                        # eagerly in this loop iteration.
                        _suffixer(r),
                    ),
                ).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _replicate_embeddings(emb: DataFrame, replicas: int, dim: int) -> DataFrame:
    """Replica r: ids shifted, vector cyclically rotated by r positions —
    rotation preserves within-replica inner products (same dup structure)
    while cross-replica cosines stay generic."""
    parts = [emb]
    for r in range(1, replicas):
        shifted = F.concat(
            F.slice(F.col("embedding"), r + 1, dim - r),
            F.slice(F.col("embedding"), 1, r),
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + r * REPLICA_STRIDE).alias("vec_id"),
                shifted.alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _replicate_events(ev: DataFrame, replicas: int) -> DataFrame:
    """Replica r: ids and user_ids shifted — more keys, same per-key
    depth, so the as-of window's per-key sort cost stays constant while
    the key space (and shuffle) scales linearly."""
    parts = [ev]
    for r in range(1, replicas):
        parts.append(
            ev.select(
                (F.col("event_id") + r * REPLICA_STRIDE).alias("event_id"),
                (F.col("user_id") + r * REPLICA_STRIDE).alias("user_id"),
                "ts",
                "event_type",
                "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _asof_views(ev: DataFrame) -> DataFrame:
    from whylogs_java_spark.operators.joins import asof_join

    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    return asof_join(
        purchases, views, on="user_id", left_ts="ts",
        right_cols=["view_value"], suffix="_v",
    )


def _drift_halves(ev: DataFrame) -> DataFrame:
    from whylogs_java_spark.operators.drift import numeric_drift

    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return numeric_drift(
        ev.where(F.col("ts") < cut),
        ev.where(F.col("ts") >= cut),
        "value",
        splits=[50.0, 100.0, 150.0, 200.0, 250.0, 300.0],
        group_by=["event_type"],
    )


def _shuffle_totals(spark: SparkSession) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all completed
    stages so far, via the UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
            stages = json.loads(r.read().decode())
    except Exception:
        return (0, 0)
    rd = sum(s.get("shuffleReadBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return (rd, wr)


def _timed(spark: SparkSession, name: str, scale: str, make, input_rows: int):
    # `make` is a factory: cluster resolution and capped bucketing run
    # eager jobs (localCheckpoint, census loop) at CONSTRUCTION time, so
    # the timed region must cover build + materialize
    make().write.format("noop").mode("overwrite").save()  # warm (JIT + cache)
    # best-of-2, same convention as bench.py — but keep each run's
    # shuffle delta WITH its time so the reported bytes describe the
    # same run as the reported seconds (AQE can re-plan between runs);
    # clamp deltas at 0 in case the UI poll fails mid-probe
    runs = []
    for _ in range(2):
        r0, w0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        make().write.format("noop").mode("overwrite").save()
        sec = time.perf_counter() - t0
        r1, w1 = _shuffle_totals(spark)
        runs.append((sec, max(0, r1 - r0), max(0, w1 - w0)))
    sec, rd, wr = min(runs)
    return {
        "query": name,
        "scale": scale,
        "input_rows": input_rows,
        "sec": round(sec, 3),
        "rows_per_sec": round(input_rows / sec),
        "shuffle_read_mb": round(rd / 1e6, 2),
        "shuffle_write_mb": round(wr / 1e6, 2),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_PROBE_DIR", "/tmp/spark_graft_probe")
    only = set(sys.argv[1:])  # optional query-name filter, e.g. "segments"
    # the UI is off in the engine defaults; the probe needs its REST API
    # for the stage-level shuffle ledger
    spark = get_spark("scaling-probe", extra_conf={"spark.ui.enabled": "true"})

    from whylogs_java_spark.sources.parquet import load_table

    # build only the corpora the selected queries read — corpus
    # replication + parquet writes dominate probe setup
    want_events = not only or bool(only & {"asof", "drift"})
    want_docs = not only or bool(only & {"near_dup", "clusters", "segments", "lm"})
    want_emb = not only or bool(only & {"emb_fast", "emb_fast_scaled_planes"})

    docs1 = _mutated_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ) if want_docs else None
    dim, emb1 = None, None
    if want_emb:
        emb_raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        dim = len(emb_raw.select("embedding").first()[0])
        emb1 = _mutated_embeddings(emb_raw)
    ev1 = (
        load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "event_type", "value"
        )
        if want_events
        else None
    )

    corpora: dict[str, dict[str, DataFrame]] = {}
    for scale, mult in (("1x", 1), ("10x", 10)):
        corpora[scale] = {}
        if want_docs:
            dpath = f"{out_dir}/docs_{scale}"
            _replicate_docs(docs1, mult).write.mode("overwrite").parquet(dpath)
            corpora[scale]["docs"] = spark.read.parquet(dpath)
        if want_emb:
            epath = f"{out_dir}/emb_{scale}"
            _replicate_embeddings(emb1, mult, dim).write.mode(
                "overwrite"
            ).parquet(epath)
            corpora[scale]["emb"] = spark.read.parquet(epath)
        if want_events:
            evpath = f"{out_dir}/events_{scale}"
            _replicate_events(ev1, mult).write.mode("overwrite").parquet(evpath)
            corpora[scale]["events"] = spark.read.parquet(evpath)

    runs = []
    for scale in ("1x", "10x"):
        docs = corpora[scale].get("docs")
        emb = corpora[scale].get("emb")
        n_docs = docs.count() if docs is not None else 0
        n_emb = emb.count() if emb is not None else 0

        def want(name: str) -> bool:
            return not only or name in only

        if want("near_dup"):
            runs.append(
                _timed(
                    spark, "near_dup", scale,
                    lambda d=docs: near_dup_pairs(d, "text", "doc_id", threshold=0.5),
                    n_docs,
                )
            )
        if want("clusters"):
            runs.append(
                _timed(
                    spark, "clusters", scale,
                    lambda d=docs: near_dup_clusters(d, "text", "doc_id", threshold=0.5),
                    n_docs,
                )
            )
        if want("segments"):
            # replica suffixes keep segments replica-local, so the distinct-
            # segment table (the owner-agg key space) grows linearly with
            # the corpus — the honest scaling shape for boilerplate dedup
            runs.append(
                _timed(
                    spark, "segments", scale,
                    lambda d=docs: segment_dedup(d, "text", "doc_id", seg_words=10),
                    n_docs,
                )
            )
        if want("lm"):
            # replica-suffixed words mean the 10x corpus has 10x the raw
            # vocabulary, but the LM tables stay capped (top-V / (V+1)^2 /
            # top-B) — the probe verifies build+score stays linear while
            # the broadcast state stays constant-size
            from whylogs_java_spark.operators.text import lm_score

            runs.append(
                _timed(
                    spark, "lm", scale,
                    lambda d=docs: lm_score(
                        d, "text", "doc_id", vocab_size=256, top_bigrams=2048
                    ),
                    n_docs,
                )
            )
        if want("emb_fast"):
            runs.append(
                _timed(
                    spark, "emb_fast", scale,
                    lambda e=emb: cosine_pairs_bucketed(
                        e, 0.9, planes=4, bands=2, arithmetic="double",
                        bucket_cap=2000,
                    ),
                    n_emb,
                )
            )
        if want("asof") or want("drift"):
            events = corpora[scale]["events"]
            n_events = events.count()
            if want("asof"):
                runs.append(
                    _timed(
                        spark, "asof", scale,
                        lambda ev=events: _asof_views(ev),
                        n_events,
                    )
                )
            if want("drift"):
                runs.append(
                    _timed(
                        spark, "drift", scale,
                        lambda ev=events: _drift_halves(ev),
                        n_events,
                    )
                )
        if scale == "10x" and want("emb_fast_scaled_planes"):
            # LSH bucket count is fixed by `planes`, so holding planes
            # constant while the corpus grows 10x multiplies within-bucket
            # pair generation ~100x (the cap bounds the worst of it). The
            # production knob is scaling planes with the corpus: +3 planes
            # = 8x the buckets, restoring ~constant bucket occupancy.
            # This run measures that knob.
            runs.append(
                _timed(
                    spark, "emb_fast_scaled_planes", scale,
                    lambda e=emb: cosine_pairs_bucketed(
                        e, 0.9, planes=7, bands=2, arithmetic="double",
                        bucket_cap=2000,
                    ),
                    n_emb,
                )
            )
    print(json.dumps({"probe": "dedup_scaling", "runs": runs}))
    spark.stop()


if __name__ == "__main__":
    main()
