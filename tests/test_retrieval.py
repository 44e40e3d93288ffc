"""Tests for BM25 keyword retrieval (`operators/retrieval.py`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from whylogs_java_spark.operators.retrieval import bm25_topk, term_stats


def _qdf(spark, rows):
    return spark.createDataFrame(rows, "query_id long, query_text string")


def test_term_stats_counts(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b  c"), (3, "")], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in term_stats(df, "text", "doc_id").collect()
    }
    assert got == {
        (1, "a"): (2, 3),
        (1, "b"): (1, 3),
        (2, "b"): (1, 2),
        (2, "c"): (1, 2),
    }


def test_bm25_ranks_tf_and_misses(spark):
    # same-length docs: more query-term occurrences must rank higher;
    # a term absent from the corpus contributes nothing; a query with
    # no matching term yields no rows at all
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple pear"),
            (2, "apple pear plum quince"),
            (3, "plum quince fig date"),
        ],
        ["doc_id", "text"],
    )
    out = bm25_topk(
        docs,
        _qdf(spark, [(1, "apple zzz"), (2, "nothere")]),
        "text",
        "doc_id",
        k=5,
    ).collect()
    q1 = sorted(
        [r for r in out if r["query_id"] == 1], key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in q1] == [1, 2]
    assert q1[0]["score"] > q1[1]["score"]
    assert not [r for r in out if r["query_id"] == 2]


def test_bm25_known_value_single_term(spark):
    # two one-term docs of equal length -> tf=2 vs tf=1, dl=2, avgdl=2:
    # hand-compute the Robertson idf + tf saturation
    docs = spark.createDataFrame([(1, "t t"), (2, "t u")], ["doc_id", "text"])
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            docs, _qdf(spark, [(1, "t")]), "text", "doc_id", k=5
        ).collect()
    }
    idf = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
    # dl == avgdl -> norm = k1
    exp1 = idf * 2 * 2.2 / (2 + 1.2)
    exp2 = idf * 1 * 2.2 / (1 + 1.2)
    assert out[1] == pytest.approx(round(exp1, 6), abs=1e-9)
    assert out[2] == pytest.approx(round(exp2, 6), abs=1e-9)


def test_bm25_k_limit_and_rank_contiguity(spark):
    docs = spark.createDataFrame(
        [(i, "w x") for i in range(10)], ["doc_id", "text"]
    )
    out = bm25_topk(
        docs, _qdf(spark, [(1, "w")]), "text", "doc_id", k=3
    ).collect()
    assert sorted(r["rank"] for r in out) == [1, 2, 3]
    # identical scores -> ties broken by ascending doc id
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [0, 1, 2]


def test_corpus_overlap_exact_and_estimate(spark):
    from whylogs_java_spark.operators.report import corpus_overlap

    # A and B share half their 3-shingles; C is disjoint from both
    docs = spark.createDataFrame(
        [
            (1, "A", "a b c d e f"),     # shingles: abc bcd cde def
            (2, "B", "c d e f g h"),     # shingles: cde def efg fgh
            (3, "C", "x y z w"),         # shingles: xyz yzw
        ],
        ["doc_id", "source", "text"],
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in corpus_overlap(
            docs, "text", "source", num_hashes=64
        ).collect()
    }
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = out[("A", "B")]
    assert (ab["n_a"], ab["n_b"], ab["n_common"]) == (4, 4, 2)
    assert ab["jaccard"] == pytest.approx(2 / 6, abs=1e-6)
    # MinHash(64) unbiased estimator of J=1/3: allow +-3 sigma
    sigma = math.sqrt((1 / 3) * (2 / 3) / 64)
    assert abs(ab["minhash_est"] - 1 / 3) <= 3 * sigma
    for key in [("A", "C"), ("B", "C")]:
        assert out[key]["n_common"] == 0
        assert out[key]["jaccard"] == 0.0
        assert out[key]["minhash_est"] == 0.0


def test_corpus_overlap_identical_sources(spark):
    docs = spark.createDataFrame(
        [(1, "A", "p q r s t"), (2, "B", "p q r s t")],
        ["doc_id", "source", "text"],
    )
    from whylogs_java_spark.operators.report import corpus_overlap

    row = corpus_overlap(docs, "text", "source", num_hashes=16).collect()[0]
    assert row["jaccard"] == 1.0
    assert row["minhash_est"] == 1.0

    with pytest.raises(ValueError):
        corpus_overlap(docs, "text", "source", num_hashes=225)


def test_corpus_overlap_xxhash_tier_matches_exact_columns(spark):
    # the production signature tier (xxhash64 instead of md5) must keep
    # every EXACT column bit-identical to the md5 tier and preserve the
    # estimator invariants: identical sets -> est 1.0, disjoint -> 0.0,
    # and a J=1/3 pair within the same 3-sigma MinHash bracket
    from whylogs_java_spark.operators.report import corpus_overlap

    docs = spark.createDataFrame(
        [
            (1, "A", "a b c d e f"),
            (2, "B", "c d e f g h"),
            (3, "C", "x y z w"),
            (4, "D", "a b c d e f"),   # D identical to A
        ],
        ["doc_id", "source", "text"],
    )
    exact_cols = ("source_a", "source_b", "n_a", "n_b", "n_common", "jaccard")

    def run(tier):
        return {
            (r["source_a"], r["source_b"]): r
            for r in corpus_overlap(
                docs, "text", "source", num_hashes=64, hash_tier=tier
            ).collect()
        }

    md5, xx = run("md5"), run("xxhash64")
    assert set(md5) == set(xx)
    for key in md5:
        for c in exact_cols:
            assert md5[key][c] == xx[key][c], (key, c)
    assert xx[("A", "D")]["minhash_est"] == 1.0
    assert xx[("A", "C")]["minhash_est"] == 0.0
    sigma = math.sqrt((1 / 3) * (2 / 3) / 64)
    assert abs(xx[("A", "B")]["minhash_est"] - 1 / 3) <= 3 * sigma
    with pytest.raises(ValueError):
        corpus_overlap(docs, "text", "source", hash_tier="bogus")


def test_monitor_stream_matches_batch(spark, tmp_path):
    """Streamed store rows + foreachBatch re-score == batch
    metric_anomalies over the batch-aggregated store, row for row."""
    from pyspark.sql import functions as F

    from whylogs_java_spark.operators.monitor import metric_anomalies
    from whylogs_java_spark.streaming.monitor_stream import (
        monitor_foreach_batch,
        windowed_metric_stream,
    )

    rows = []
    for d in range(10):
        for m, v in [(5, 10.0), (25, 12.0), (45, 11.0)]:
            # day 7 spikes for key "a"
            va = 500.0 if d == 7 else v
            rows.append((f"2024-01-{d+1:02d} 00:{m:02d}:00", "a", va))
            rows.append((f"2024-01-{d+1:02d} 00:{m:02d}:00", "b", v + d))
    rows.append(("2024-02-01 00:00:00", "flush", 0.0))
    df = spark.createDataFrame(rows, "ts string, col string, v double").select(
        F.col("ts").cast("timestamp").alias("ts"), "col", "v"
    )
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)

    store_dir = str(tmp_path / "store")
    anom_dir = str(tmp_path / "anom")
    stream = spark.readStream.schema(df.schema).parquet(src)
    metrics = windowed_metric_stream(
        stream, "v", "ts", group_by=("col",), window_duration="1 day"
    )
    q = (
        metrics.writeStream.outputMode("append")
        .foreachBatch(
            monitor_foreach_batch(
                store_dir, anom_dir, keys=("col",), window=3, min_obs=2
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        spark.read.parquet(anom_dir).collect(),
        key=lambda r: (str(r["bucket"]), r["col"]),
    )
    batch_store = windowed_metric_stream(
        df.where(F.col("col") != "flush"),
        "v",
        "ts",
        group_by=("col",),
        window_duration="1 day",
    )
    want = sorted(
        metric_anomalies(
            batch_store, metric="value", time_col="bucket",
            keys=("col",), window=3, min_obs=2,
        ).collect(),
        key=lambda r: (str(r["bucket"]), r["col"]),
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    flagged = [(str(r["bucket"])[:10], r["col"]) for r in got if r["is_anomaly"]]
    assert ("2024-01-08", "a") in flagged
    assert not any(c == "b" for _, c in flagged)


def test_embedding_drift_identical_and_shifted(spark):
    from whylogs_java_spark.operators.drift import embedding_drift

    base = [(i, [1.0, 2.0, 3.0]) for i in range(4)]
    a = spark.createDataFrame(base, "id long, v array<double>")
    row = embedding_drift(a, a, "v").collect()[0]
    assert row["n_ref"] == row["n_cur"] == 4
    assert row["cosine_means"] == 1.0
    assert row["l2_means"] == 0.0
    assert row["max_dim_shift"] == 0.0

    # shift dim 2 by +1 in the current slice: l2 = 1, max shift = 1,
    # mean |shift| = 1/3
    b = spark.createDataFrame(
        [(i, [1.0, 2.0, 4.0]) for i in range(4)], "id long, v array<double>"
    )
    row = embedding_drift(a, b, "v").collect()[0]
    assert row["l2_means"] == pytest.approx(1.0, abs=1e-6)
    assert row["max_dim_shift"] == pytest.approx(1.0, abs=1e-6)
    assert row["mean_abs_shift"] == pytest.approx(1 / 3, abs=1e-6)
    import numpy as np

    want_cos = float(
        np.dot([1, 2, 3], [1, 2, 4])
        / (np.linalg.norm([1, 2, 3]) * np.linalg.norm([1, 2, 4]))
    )
    assert row["cosine_means"] == pytest.approx(want_cos, abs=1e-6)


def test_embedding_drift_large_components_exact(spark):
    """r12 magnitude audit pin: embedding_drift's integer dot products
    take DIFFERENCES in int64 before any double cast, so near-identical
    mean vectors with LARGE components (the regime where a double
    raw-moment spelling would cancel) report exact shifts."""
    import numpy as np

    from whylogs_java_spark.operators.drift import embedding_drift

    # int64 domain bound: the mean-vector dots sum squared 1e6-scaled
    # means over dims and the l2 doubles one, so 2·Σ_d(x·1e6)² must fit
    # a long -> |x| ≤ ~2100/√d (ANSI-loud beyond — probed: 9e5 and 2e3
    # components overflow exactly as documented)
    big = 1_000.0
    a = spark.createDataFrame(
        [(i, [big, -big, big / 2]) for i in range(8)],
        "id long, v array<double>",
    )
    b = spark.createDataFrame(
        [(i, [big + 0.25, -big, big / 2 - 0.125]) for i in range(8)],
        "id long, v array<double>",
    )
    row = embedding_drift(a, b, "v").collect()[0]
    # shifts are tiny relative to the components: a cancelling
    # implementation would report 0 or noise here
    assert row["max_dim_shift"] == pytest.approx(0.25, abs=1e-6)
    assert row["mean_abs_shift"] == pytest.approx((0.25 + 0.125) / 3, abs=1e-6)
    va = np.array([big, -big, big / 2])
    vb = np.array([big + 0.25, -big, big / 2 - 0.125])
    # output is ROUND(·, 6): compare at the rounding's own resolution
    assert row["l2_means"] == pytest.approx(
        float(np.linalg.norm(va - vb)), abs=1e-6
    )


# ---------------------------------------------------------------------------
# r12 positional inverted index + phrase search
# ---------------------------------------------------------------------------

def _phrase_corpus(spark):
    rows = [
        (1, "a a a b a a"),          # overlapping chains
        (2, "Hash JOIN  beats sort"),  # case + double space
        (3, None),                    # NULL text
        (4, "hash"),                  # partial phrase only
        (5, "x hash join y hash join"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_counts_overlap_and_case(spark):
    from whylogs_java_spark.operators.retrieval import phrase_search

    df = _phrase_corpus(spark)
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(df, "text", "doc_id", "a a").collect()}
    assert got == {1: 3}  # starts at positions 1, 2, 5
    got2 = {r["doc_id"]: r["n_matches"]
            for r in phrase_search(df, "text", "doc_id", "HASH join").collect()}
    assert got2 == {2: 1, 5: 2}


def test_phrase_stored_matches_scan_path(spark, tmp_path):
    from whylogs_java_spark.operators.retrieval import (
        build_text_index, phrase_search, phrase_search_stored,
    )

    df = _phrase_corpus(spark)
    p = str(tmp_path / "tix")
    build_text_index(df, p, "text", "doc_id", n_buckets=8)
    for phrase in ("a a", "hash join", "hash", "a a a", "zz"):
        scan = sorted(map(tuple, phrase_search(df, "text", "doc_id", phrase).collect()))
        stored = sorted(map(tuple, phrase_search_stored(spark, p, phrase).collect()))
        assert scan == stored, (phrase, scan, stored)


def test_text_index_meta_refusal(spark, tmp_path):
    from whylogs_java_spark.operators.retrieval import (
        build_text_index, read_text_index,
    )

    df = _phrase_corpus(spark)
    p = str(tmp_path / "tix")
    build_text_index(df, p, "text", "doc_id", n_buckets=8)
    postings, nb = read_text_index(spark, p, n_buckets=8)
    assert nb == 8 and postings.count() > 0
    with pytest.raises(ValueError, match="n_buckets"):
        read_text_index(spark, p, n_buckets=16)
    with pytest.raises(ValueError):
        build_text_index(df, p, "text", "doc_id", n_buckets=0)
    with pytest.raises(ValueError):
        from whylogs_java_spark.operators.retrieval import phrase_search_stored
        phrase_search_stored(spark, p, "   ")


def test_phrase_stored_prunes_bucket_partitions(spark, tmp_path):
    """The probe must read only the phrase terms' bucket partitions:
    the postings scan's plan carries a PartitionFilters entry on
    `bucket`, so a 64-bucket store serves a 2-term phrase from <=2
    partition directories."""
    from whylogs_java_spark.operators.retrieval import (
        build_text_index, phrase_search_stored,
    )

    df = _phrase_corpus(spark)
    p = str(tmp_path / "tix")
    build_text_index(df, p, "text", "doc_id", n_buckets=8)
    out = phrase_search_stored(spark, p, "hash join")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    # and the filters are non-empty (literal IN over the term buckets)
    import re
    pf = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any(s.strip() for s in pf), plan


def test_phrase_stored_positions_capped_per_doc(spark, tmp_path):
    """A stop-word term's postings spread one row per doc (positions
    stay WITH the row) — the store has no corpus-wide hot row, and the
    probe's join starts from the rarest term's list."""
    from whylogs_java_spark.operators.retrieval import (
        build_text_index, phrase_search_stored, read_text_index,
    )

    rows = [(i, "the " * 50 + ("needle point" if i == 7 else "filler"))
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "tix")
    build_text_index(df, p, "text", "doc_id", n_buckets=4)
    postings, _ = read_text_index(spark, p)
    the_rows = postings.where(F.col("term") == "the")
    assert the_rows.count() == 40  # one row per doc, never exploded
    assert the_rows.agg(F.max(F.size("positions"))).collect()[0][0] == 50
    got = phrase_search_stored(spark, p, "needle point").collect()
    assert [(r["doc_id"], r["n_matches"]) for r in got] == [(7, 1)]


def test_bm25_stored_bit_identical_to_memory(spark, tmp_path):
    """Stored BM25 == in-memory bm25_topk over lowercased text, rank
    for rank, bit for bit (same rounding, same tie-break)."""
    from whylogs_java_spark.operators.retrieval import (
        bm25_topk, bm25_topk_stored, build_text_index,
    )

    docs = spark.createDataFrame(
        [(1, "the hash join beats sort merge"),
         (2, "hash hash hash tables everywhere"),
         (3, "sort merge join wins sometimes"),
         (4, "UPPER Case Hash JOIN text"),
         (5, None), (6, "")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(1, "hash join"), (2, "sort merge"), (3, "zz-nothing")],
        "query_id long, query_text string",
    )
    mem = sorted(map(tuple, bm25_topk(
        docs.select("doc_id", F.lower("text").alias("text")),
        qdf, "text", "doc_id", k=3,
    ).collect()))
    p = str(tmp_path / "bmix")
    build_text_index(docs, p, "text", "doc_id", n_buckets=8)
    st = sorted(map(tuple, bm25_topk_stored(spark, p, qdf, k=3).collect()))
    assert mem == st and len(st) > 0
    # doc 4 matched via lowercasing; query 3 matched nothing
    assert any(r[2] == 4 for r in st)
    assert not any(r[0] == 3 for r in st)


def test_bm25_stored_refuses_legacy_index(spark, tmp_path):
    """An index without the denormalized dl column (pre-BM25 layout)
    refuses loudly instead of mis-scoring."""
    from whylogs_java_spark.operators.retrieval import (
        bm25_topk_stored, build_text_index,
    )

    docs = spark.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    built = str(tmp_path / "built")
    build_text_index(docs, built, "text", "doc_id", n_buckets=2)
    # assemble a legacy-layout twin: same meta/stats, postings minus dl
    legacy = str(tmp_path / "legacy")
    spark.read.parquet(f"{built}/postings").drop("dl").write.parquet(
        f"{legacy}/postings"
    )
    spark.read.parquet(f"{built}/meta").write.parquet(f"{legacy}/meta")
    qdf = spark.createDataFrame([(1, "a")], "query_id long, query_text string")
    with pytest.raises(ValueError, match="dl"):
        bm25_topk_stored(spark, legacy, qdf)
    with pytest.raises(ValueError, match="no terms"):
        bm25_topk_stored(spark, built, spark.createDataFrame(
            [(1, "   ")], "query_id long, query_text string"))


def test_append_text_index_equals_union_rebuild(spark, tmp_path):
    """build(A) + append(B) must be bit-identical to build(A ∪ B) for
    BOTH probes: phrase counts and BM25 (stats rewritten as old+delta,
    so avgdl/n_docs match the union exactly)."""
    from whylogs_java_spark.operators.retrieval import (
        append_text_index, bm25_topk_stored, build_text_index,
        phrase_search_stored,
    )

    a = spark.createDataFrame(
        [(1, "the hash join beats sort merge"),
         (2, "hash hash tables everywhere")],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(3, "sort merge join wins sometimes"),
         (4, "hash join hash join")],
        "doc_id long, text string",
    )
    inc = str(tmp_path / "inc")
    build_text_index(a, inc, "text", "doc_id", n_buckets=4)
    append_text_index(b, inc, "text", "doc_id")
    full = str(tmp_path / "full")
    build_text_index(a.unionByName(b), full, "text", "doc_id", n_buckets=4)

    ph_inc = sorted(map(tuple, phrase_search_stored(spark, inc, "hash join").collect()))
    ph_full = sorted(map(tuple, phrase_search_stored(spark, full, "hash join").collect()))
    assert ph_inc == ph_full and ph_inc == [(1, 1), (4, 2)]

    qdf = spark.createDataFrame(
        [(1, "hash join"), (2, "sort merge")],
        "query_id long, query_text string",
    )
    bm_inc = sorted(map(tuple, bm25_topk_stored(spark, inc, qdf).collect()))
    bm_full = sorted(map(tuple, bm25_topk_stored(spark, full, qdf).collect()))
    assert bm_inc == bm_full and len(bm_inc) > 0

    stats = spark.read.parquet(f"{inc}/stats").collect()[0]
    assert stats["n_docs"] == 4 and stats["avgdl"] == pytest.approx(
        spark.read.parquet(f"{full}/stats").collect()[0]["avgdl"]
    )


def test_rrf_fuse_known_values(spark):
    """RRF: both-lists docs sum both reciprocals, single-list docs get
    one, ties break on ascending id, validation refuses bad k/k0."""
    from whylogs_java_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 1, 10), (1, 2, 11), (2, 1, 20)],
        "query_id long, rank long, doc_id long",
    )
    b = spark.createDataFrame(
        [(1, 1, 11), (1, 2, 12), (2, 1, 21)],
        "query_id long, rank long, doc_id long",
    )
    got = {(r["query_id"], r["doc_id"]): (r["rank"], r["rrf_score"])
           for r in rrf_fuse(a, b, "doc_id", k0=60, k=10).collect()}
    # q1: doc 11 in both (1/62 + 1/61), doc 10 only a (1/61), doc 12
    # only b (1/62)
    assert got[(1, 11)][1] == pytest.approx(round(1 / 62 + 1 / 61, 6))
    assert got[(1, 11)][0] == 1
    assert got[(1, 10)] == (2, pytest.approx(round(1 / 61, 6)))
    assert got[(1, 12)] == (3, pytest.approx(round(1 / 62, 6)))
    # q2: same rounded score for 20 and 21 -> id tie-break
    assert got[(2, 20)][0] == 1 and got[(2, 21)][0] == 2
    with pytest.raises(ValueError):
        rrf_fuse(a, b, "doc_id", k0=0)
    with pytest.raises(ValueError):
        rrf_fuse(a, b, "doc_id", k=0)


def test_build_text_index_refuses_tokenless_corpus(spark, tmp_path):
    """r12 review find: a corpus with no tokens (all NULL/empty text)
    must refuse loudly instead of crashing on the stats read-back and
    leaving a half-written store."""
    from whylogs_java_spark.operators.retrieval import build_text_index

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no tokens"):
        build_text_index(df, str(tmp_path / "empty_ix"), "text", "doc_id")


def test_phrase_search_many_matches_singles(spark):
    """One-scan multi-phrase screen == per-phrase phrase_search, and a
    doc matching several phrases yields one row per phrase."""
    from whylogs_java_spark.operators.retrieval import (
        phrase_search, phrase_search_many,
    )

    df = _phrase_corpus(spark)
    phrases = ["a a", "hash join", "zz"]
    many = {(r["doc_id"], r["phrase"]): r["n_matches"]
            for r in phrase_search_many(df, "text", "doc_id", phrases).collect()}
    singles = {}
    for p in phrases:
        for r in phrase_search(df, "text", "doc_id", p).collect():
            singles[(r["doc_id"], p)] = r["n_matches"]
    assert many == singles and len(many) > 0
    with pytest.raises(ValueError):
        phrase_search_many(df, "text", "doc_id", [])
    with pytest.raises(ValueError):
        phrase_search_many(df, "text", "doc_id", ["ok", "   "])


def test_phrase_search_many_zero_shuffle_plan(spark):
    """The multi-phrase screen must stay a pure scan projection: no
    Exchange anywhere in the executed plan."""
    from whylogs_java_spark.operators.retrieval import phrase_search_many

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        phrase_search_many(df, "text", "doc_id", ["hash join", "sort merge"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_retrieval_eval_hand_computed_metrics(spark):
    """retrieval_eval against a hand-worked fixture: q1 has relevant at
    ranks 2 and 5 of 3 judged; q2's run has no relevant docs; q3 is
    judged but absent from the run (zeros row); q4 appears in the run
    but is UNJUDGED (excluded — trec_eval convention). Duplicate qrels
    rows must not double-count."""
    import math

    import pytest as _pytest

    from whylogs_java_spark.operators.retrieval import retrieval_eval

    runs = spark.createDataFrame(
        [(1, r, 100 + r) for r in range(1, 6)]
        + [(2, 1, 201), (2, 2, 202)]
        + [(4, 1, 401)],
        "query_id long, rank long, doc_id long",
    )
    qrels = spark.createDataFrame(
        [(1, 102), (1, 105), (1, 999), (1, 102),   # dup row
         (2, 777),
         (3, 301), (3, 302)],
        "query_id long, doc_id long",
    )
    out = {r["query_id"]: r for r in retrieval_eval(runs, qrels, k=5).collect()}
    assert set(out) == {1, 2, 3}  # q4 unjudged -> excluded

    q1 = out[1]
    assert q1["n_rel"] == 3 and q1["hits_at_k"] == 2
    assert q1["precision_at_k"] == 0.4
    assert q1["recall_at_k"] == round(2 / 3, 6)
    assert q1["mrr"] == 0.5  # first relevant at rank 2
    dcg = 1 / math.log2(3) + 1 / math.log2(6)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert q1["ndcg_at_k"] == _pytest.approx(dcg / idcg, abs=1e-6)

    q2 = out[2]
    assert (q2["hits_at_k"], q2["mrr"], q2["ndcg_at_k"]) == (0, 0.0, 0.0)
    q3 = out[3]
    assert q3["n_rel"] == 2 and q3["hits_at_k"] == 0
    assert (q3["recall_at_k"], q3["mrr"], q3["ndcg_at_k"]) == (0.0, 0.0, 0.0)

    with _pytest.raises(ValueError, match="k must"):
        retrieval_eval(runs, qrels, k=0)


def test_retrieval_eval_dedups_repeated_run_docs(spark):
    """A run that repeats a doc inside its top-k (a buggy or fused
    ranker) scores that doc ONCE at its best rank — trec_eval dedups
    judged docs, so precision/recall/nDCG stay <= 1.0 instead of
    double-counting hits."""
    from whylogs_java_spark.operators.retrieval import retrieval_eval

    runs = spark.createDataFrame(
        [(1, 1, 101), (1, 2, 101), (1, 3, 101), (1, 4, 102), (1, 5, 101)],
        "query_id long, rank long, doc_id long",
    )
    qrels = spark.createDataFrame(
        [(1, 101), (1, 102)], "query_id long, doc_id long"
    )
    r = retrieval_eval(runs, qrels, k=5).collect()[0]
    # doc 101 counts once (best rank 1), doc 102 once at rank 4
    assert r["hits_at_k"] == 2 and r["n_rel"] == 2
    assert r["precision_at_k"] == 0.4  # 2 distinct hits / k=5
    assert r["recall_at_k"] == 1.0
    assert r["mrr"] == 1.0
    assert 0.0 < r["ndcg_at_k"] <= 1.0
