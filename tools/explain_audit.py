"""Dump formatted physical plans of the headline queries to PLANS.md.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from whylogs_java_spark import get_spark  # noqa: E402

AUDITED = [
    (
        "profile_lineitem",
        "Single-pass grouped profile: pruned scan -> derived projection -> "
        "partial+final HashAggregate on the group key (shuffle carries only "
        "partial-aggregate rows) -> inline explode to long format.",
    ),
    (
        "profile_merge",
        "Merge pipeline: one scan aggregates at (keys, parity), the tiny "
        "sub-profile atoms re-aggregate to keys — the stored-profile merge "
        "shape without a second scan.",
    ),
    (
        "histogram_lineitem",
        "Two aggregation passes over one column; the per-group stats side "
        "joins back via BroadcastHashJoin, so the data side never shuffles.",
    ),
    (
        "dedup_near_documents",
        "MinHash-LSH. EXECUTED adaptive plan (not the static one): AQE "
        "ReusedExchange collapses the statically-duplicated branches, so "
        "exactly TWO shingle explodes run — one into the minhash partial "
        "aggregate (16 longs/doc cross that shuffle; the band join's "
        "second side is a ReusedExchange), one into the distinct "
        "(doc, shingle) shuffle written once and read 3x (sizes + both "
        "Jaccard sides) from disk-backed shuffle files. The band self "
        "equi-join on (band, band_sig) is a bucket join, no cross "
        "product. An explicitly staged persist/checkpoint variant "
        "(near_dup_pairs(materialize=True)) was measured 1.5-2x slower "
        "at sf0.1 and is kept for lineage-severing composition.",
    ),
    (
        "similarity_topk_fast",
        "Brute-force ANN baseline: queries broadcast; dot products are JVM "
        "zip_with folds inside the scan projection; top-k via window over "
        "the per-query candidate rows.",
    ),
    (
        "dedup_embedding_fast",
        "Production bucketed embedding dedup: per-length hyperplane sign "
        "arrays broadcast once (no per-row md5), signatures via zip_with "
        "folds, candidates from a self equi-join on the bucket string (no "
        "cross product), exact verify on vectors carried through the join "
        "- no dim explode anywhere.",
    ),
    (
        "similarity_ivf",
        "IVF ANN: broadcast coarse centroids; one-scan nearest-centroid "
        "assignment makes inverted lists a centroid_id column; queries "
        "probe nprobe lists via equi-join on the list key - the corpus "
        "shuffles once on the list key, never all-pairs. Per-vector norms "
        "fold once into a column (1 interpreted fold per scored pair, "
        "not 3).",
    ),
    (
        "dedup_clusters",
        "Near-dup cluster resolution: the verified pair list materializes "
        "ONCE (localCheckpoint) before the label-propagation loop, so each "
        "round joins a checkpointed edge table - the MinHash pipeline does "
        "NOT re-execute per iteration. The plan below is the final labels "
        "projection; the per-round join+min-agg shuffles only (id, label) "
        "rows.",
    ),
    (
        "sample_documents",
        "Deterministic stratified Bernoulli sample: a pure scan-side "
        "filter on an md5-derived key - no shuffle, no exchange; composes "
        "with column pruning (only doc_id/lang read).",
    ),
    (
        "repetition_documents",
        "Repetition quality metrics: one explode per n-gram order into a "
        "two-level hash-aggregate, both shuffles keyed on the doc id (a "
        "hot gram cannot skew a partition); the unigram and bigram "
        "branches join on the doc id.",
    ),
    (
        "decontam_documents",
        "Test-set decontamination: the eval n-gram digest set is DISTINCTed "
        "and broadcast (BroadcastHashJoin on the gram — the corpus never "
        "shuffles its bytes); the only wide exchange is the per-doc hit "
        "aggregation, carrying matched (doc, gram) pairs only. The counts "
        "branch computes n_ngrams arithmetically, so the md5 gram walk "
        "runs exactly once.",
    ),
    (
        "split_documents",
        "Deterministic split assignment: the split label is a pure "
        "projection (md5 hash-threshold) inside the scan stage; the only "
        "exchange is the (source, split) summary aggregation.",
    ),
    (
        "lm_score_documents",
        "Bigram-LM quality score: the vocabulary (top-V TakeOrdered) and "
        "the mapped-bigram count table (bounded at (V+1)^2 rows by "
        "unk-mapping before counting) each checkpoint once and come back "
        "as BroadcastExchanges; scoring is scan -> bigram array projection "
        "-> explode -> three BroadcastHashJoins -> one doc-keyed "
        "hash-aggregate. The corpus scans exactly three times (vocab, LM "
        "build, scoring).",
    ),
    (
        "encoding_documents",
        "Encoding-hygiene scan: pure scan-side projection — every counter "
        "is a regexp_extract_all size over the text column; no exchange "
        "at any scale.",
    ),
    (
        "dedup_segments",
        "Segment-level corpus dedup: explode to (doc, pos, segment digest); "
        "owner = min(struct(id,pos)) hash-agg on the digest (map-side "
        "partial min collapses the corpus-wide repeated segment before the "
        "exchange); equi-join back on the digest (owners are corpus-sized — "
        "deliberately NOT broadcast); reassembly agg keys on the doc id "
        "with O(doc) state.",
    ),
    (
        "asof_events",
        "As-of join via union-merge: both sides union into ONE Exchange on "
        "the key, per-key time-sorted Window carries the latest right row "
        "forward (last ignorenulls), filter back to left rows. No "
        "BroadcastNestedLoopJoin, no range predicate in the planner.",
    ),
    (
        "range_bands",
        "Point-in-interval as an equi-join: intervals explode to the "
        "buckets they span, points hash to one bucket, join on the bucket "
        "key + exact containment filter. A small interval side broadcasts "
        "under AQE; no cross product at any scale.",
    ),
    (
        "drift_events_value",
        "Numeric drift: each slice reduces in one scan to per-(group, bin) "
        "partial HashAggregates; the cross-slice full-outer join and the "
        "PSI/CDF windows run over O(groups x bins) rows only.",
    ),
    (
        "overlap_lineitem",
        "Interval-overlap join: both sides explode to spanned buckets, "
        "equi-join per (key, bucket), and the first-shared-bucket filter "
        "keeps each pair exactly once — no distinct, no nested loop.",
    ),
    (
        "profile_diff_lineitem",
        "Profile-store drift: two full profile aggregations (each the "
        "single-pass profile plan) joined per column. The full-outer join "
        "(not broadcastable by definition) sort-merges O(columns) rows — "
        "trivial at any corpus size; the scans dominate.",
    ),
    (
        "profile_events_hourly",
        "Grouped profile at 13.5k (hour, type) groups: the identical "
        "single-pass partial+final HashAggregate shape as "
        "profile_lineitem — more groups inflate only the aggregate row "
        "count (O(groups × columns)), never the data-row shuffle; the "
        "explode to long format stays post-aggregation.",
    ),
    (
        "dedup_char_ngram",
        "Char-5-gram MinHash LSH — the heaviest query by nature "
        "(≈n_chars shingles/doc). Same bucketed shape as the word tier: "
        "the shingle explode feeds the minhash partial aggregate, "
        "candidates come from the band self equi-join on "
        "(band, band_sig), and the distinct (doc, gram) shuffle is "
        "written once and re-read for sizes + both Jaccard sides. No "
        "cross product; cost scales with total characters.",
    ),
    (
        "dedup_containment_fragment",
        "Containment dedup, fragment mode: small fragments draw "
        "candidates from an inverted index on their RAREST shingles "
        "(bounded explode per doc), so candidate generation stays an "
        "equi-join on the shingle digest — never all-pairs — and exact "
        "containment verifies on candidate pairs only.",
    ),
    (
        "dedup_incremental",
        "Incremental cross-corpus dedup: only REF × NEW band collisions "
        "generate candidates (the new side never self-joins), so a daily "
        "increment costs its own scan plus an equi-join against the "
        "reference signature table keyed on (band, band_sig).",
    ),
    (
        "dedup_semantic",
        "SemDeDup: candidates pruned to k-means clusters — the cluster "
        "self equi-join bounds the cosine quadratic by the largest "
        "cluster; the checkpointed assignment table feeds both join "
        "sides; fold-once norms; pairs repartition before the "
        "interpreted cosine folds. No cross product.",
    ),
    (
        "monitor_events_mean",
        "Profile-store stddev monitor: ONE daily-profile aggregation "
        "(the flagship single-pass shape) filtered to the monitored "
        "column, then pure window functions over O(days) rows — exact "
        "integer trailing sums, no second data pass.",
    ),
    (
        "dedup_simhash_pairs",
        "SimHash pair generation: pigeonhole block equi-join (a "
        "within-distance pair matches exactly on ≥1 of max_hamming+1 "
        "fingerprint blocks) over the checkpointed fingerprint table; "
        "exact Hamming verify on candidates only — never all-pairs.",
    ),
    (
        "topk_drift_part",
        "Heavy-hitter churn: two bounded exact top-k tables (two-phase "
        "salted partial top-k each) full-outer joined per value — "
        "aggregate-sized end to end.",
    ),
    (
        "rolling_topk_events",
        "Day-over-day top-k churn: one scan to per-(day, value) counts; "
        "rank windows and the shifted previous side both derive from "
        "that aggregate — O(days × values) rows after the scan.",
    ),
    (
        "constraints_lineitem",
        "Profile constraints gate: the rules table (O(rules) literal "
        "rows) broadcasts into a hash equi-join against the generated "
        "profile — O(groups × columns) aggregate rows; the single wide "
        "exchange is the profile aggregation itself, same as the "
        "flagship. Evaluation is pure projection over the joined rows.",
    ),
    (
        "profile_diff_sketch",
        "Sketch-store drift: both days' KLL/HLL/theta sketch blobs "
        "aggregate once each into O(columns) sketch rows; the diff "
        "(rank probes at foldable literal edges, cardinality deltas) "
        "runs entirely over those aggregate-sized rows — diffing two "
        "stored 100 TB days reads only sketch rows, never data rows.",
    ),
    (
        "dedup_semantic_survivors",
        "SemDeDup end-to-end: within-cluster cosine pairs (the vecs "
        "table localCheckpoints ONCE before the cluster-keyed self "
        "equi-join — the k-means lineage does not re-execute per side) "
        "feed min-label connected components; the star/label loop joins "
        "checkpointed (id, label) rows only. Quadratic term bounded by "
        "the largest cluster; no cross product.",
    ),
    (
        "cluster_embeddings_k64",
        "Large-k k-means via the broadcast-centroid-TABLE join "
        "assignment (k=64 > LITERAL_K_MAX): plan size constant in k — "
        "the fan-out is ONE BroadcastNestedLoopJoin against a bounded "
        "k-row broadcast relation (deliberate: the 'nested loop' is "
        "k-bounded, not data × data), then a map-side-combined "
        "min-struct argmin keyed on the vector id. The k·dim "
        "exact-integer centroid aggregate is unchanged from the "
        "literal path.",
    ),
    (
        "similarity_ivf_int8",
        "IVF × int8 (PQ-lite): the per-dim affine census reduces to ONE "
        "broadcast row; codes/reconstruction are zip_with folds inside "
        "the scan (8 bits/dim in the lists instead of 64 — the 100 TB "
        "ANN memory story); list probe is the same centroid_id "
        "equi-join as similarity_ivf; candidates score on reconstructed "
        "vectors (query side exact — asymmetric); only O(queries × "
        "rerank) survivors re-score on doubles.",
    ),
    (
        "pipeline_manifest",
        "Six composed operators (clean → exact dedup → near dedup → "
        "decontam → quality gate → split) planned as ONE statement; "
        "materialized boundaries (localCheckpoint) only where a corpus "
        "is reused by later stages, each stage keeping its own audited "
        "shape (broadcast digest screens, bucketed LSH candidates, "
        "scan-side split labels).",
    ),
]


KEEP_DETAIL = ("Scan ", "Exchange", "Join", "Window", "Sort ", "Generate")


def _raw_plan(df) -> str:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    plan = re.sub(r"#\d+L?", "", plan)
    return re.sub(r"plan_id=\d+", "plan_id=*", plan)


def _condense(plan: str, keep_detail=KEEP_DETAIL) -> str:
    tree, details = plan.split("\n\n", 1) if "\n\n" in plan else (plan, "")
    kept = []
    for block in details.split("\n\n"):
        header = block.splitlines()[0] if block else ""
        if any(k in header for k in keep_detail):
            kept.append("\n".join(block.splitlines()[:8]))
    return tree + "\n\n" + "\n\n".join(kept)


def _dedup_executed_section(spark, sf_dir: str, commentary: str) -> str:
    """Render the FINAL adaptive plan (post-execution) so ReusedExchange
    sharing is visible — the static plan misleadingly shows ~6 explodes."""
    qs = entry_mod.queries()
    df = qs["dedup_near_documents"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = re.sub(r"#\d+L?", "", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=*", plan)
    # keep the final-plan tree only (drop the '+- == Initial Plan ==' tail)
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==", 1)[0]
    kept = []
    for line in plan.splitlines():
        kept.append(line[:160])
    n_explodes = len(re.findall(r"Generate explode\(CASE WHEN", "\n".join(kept)))
    n_reused = len(re.findall(r"ReusedExchange", "\n".join(kept)))
    body = (
        f"executed shingle explodes: {n_explodes}  |  ReusedExchange nodes: "
        f"{n_reused}\n\n" + "\n".join(kept)
    )
    return f"## dedup_near_documents\n\n{commentary}\n\n```\n{body}\n```\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit")
    qs = entry_mod.queries()
    sections = [
        "# PLANS — formatted physical plans of headline queries\n",
        f"Generated by `python tools/explain_audit.py {sf_dir}`. Read these "
        "for the scale story: where shuffles happen, what gets pruned, "
        "which joins broadcast.\n",
    ]
    for name, commentary in AUDITED:
        if name == "dedup_near_documents":
            sections.append(_dedup_executed_section(spark, sf_dir, commentary))
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # strip volatile ids for a stable, reviewable artifact
        plan = re.sub(r"#\d+L?", "", plan)
        plan = re.sub(r"plan_id=\d+", "plan_id=*", plan)
        # keep the tree plus detail blocks for the nodes that tell the scale
        # story (scans, shuffles, joins); drop the giant expression dumps
        keep_detail = ("Scan ", "Exchange", "Join", "Window", "Sort ", "Generate")
        body = _condense(plan, keep_detail)
        sections.append(f"## {name}\n\n{commentary}\n\n```\n{body}\n```\n")
    with open("PLANS.md", "w") as f:
        f.write("\n".join(sections))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
