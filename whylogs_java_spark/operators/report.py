"""Per-slice corpus health report — the "dataset card" aggregate.

Composes the per-document text-hygiene operators (Gopher quality gates,
encoding-hygiene scan, token counts, boilerplate saturation) into one
grouped summary a pipeline owner reads per source/language/shard before
training: how many documents, how many tokens, how many encoding-suspect
pages, and the mean quality / boilerplate saturation of the slice.

Scale shape: the three projection components chain through ``keep_cols``
into ONE corpus scan (no self-joins); only the boilerplate branch —
which needs its own segment explode and digest census regardless —
joins back on the high-cardinality doc id (skew-free), and the whole
report ends in one hash-aggregate on the slice key. Mean doubles
accumulate as exact integers (floor(x·1e6 + 0.5) summed as BIGINT — the
same magnitude-tiered-exact-sum idea as functions/metrics.py), because a
shuffled double sum is order-nondeterministic and would break the
cross-engine oracle; the inputs are already rounded to 6 decimals, so
the integerization is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ckpt import materialize_lazy

from .dedup import boilerplate_stats
from .text import encoding_scan, quality_metrics, token_counts

_MEAN_SCALE = 1_000_000  # exact-integer accumulator for rounded-6 inputs


def _exact_mean(col: str) -> Column:
    s = F.sum(
        F.floor(F.col(col) * _MEAN_SCALE + F.lit(0.5)).cast("long")
    )
    return (
        F.round(s / (F.count(F.lit(1)) * F.lit(float(_MEAN_SCALE))), 6) + 0.0
    )


def corpus_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    group_col: str,
    boiler_seg_words: int = 10,
    boiler_df_threshold: int = 2,
) -> DataFrame:
    """One row per ``group_col`` slice: (group, n_docs, total_tokens,
    suspect_docs, mean_quality, mean_boilerplate_frac).

    ``suspect_docs`` counts encoding-suspect documents; ``mean_quality``
    averages the Gopher composite gate score; ``mean_boilerplate_frac``
    averages the corpus-repeated segment fraction at
    ``boiler_df_threshold`` distinct docs. Deterministic end to end
    (exact counts + integerized means), so oracle-checkable.
    """
    # the three projection operators CHAIN via keep_cols — one corpus scan
    # computes quality + encoding + tokens with no self-join; only the
    # boilerplate branch (which needs its own segment explode and digest
    # census regardless) joins back on the doc id
    x = quality_metrics(
        df, text_col, id_col, keep_cols=(group_col, text_col)
    ).select(id_col, group_col, text_col, "quality")
    x = encoding_scan(
        x, text_col, id_col, keep_cols=(group_col, text_col, "quality")
    ).select(id_col, group_col, text_col, "quality", "encoding_suspect")
    x = token_counts(
        x, text_col, id_col, keep_cols=(group_col, "quality", "encoding_suspect")
    ).select(id_col, group_col, "quality", "encoding_suspect", "ws_tokens")
    b = boilerplate_stats(
        df, text_col, id_col,
        seg_words=boiler_seg_words, df_threshold=boiler_df_threshold,
    ).select(id_col, "boilerplate_fraction")
    j = x.join(b, id_col)
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_tokens"),
        F.sum(F.col("encoding_suspect").cast("long")).alias("suspect_docs"),
        _exact_mean("quality").alias("mean_quality"),
        _exact_mean("boilerplate_fraction").alias("mean_boilerplate_frac"),
    )


def corpus_overlap(
    df: DataFrame,
    text_col: str,
    source_col: str,
    num_hashes: int = 32,
    shingle_size: int = 3,
    hash_tier: str = "md5",
) -> DataFrame:
    """Source-by-source corpus overlap matrix: exact shingle-set Jaccard
    plus the MinHash estimate of the same quantity, one row per unordered
    source pair.

    The cross-corpus contamination audit a pipeline owner runs before
    mixing sources: how much of source A's n-gram mass already lives in
    source B. Reporting BOTH the exact Jaccard and its MinHash estimate
    also makes this the accuracy dashboard for MinHash at the chosen
    shingle size before trusting the dedup family's sketch decisions.

    Scale shape: sources are few by construction (a corpus has tens of
    provenances, not millions), so every per-source aggregate is
    broadcast-sized. The expensive parts touch data exactly twice:
    (1) one shingle explode -> distinct (source, shingle) -> min-per-hash
    aggregate with map-side partial min (the MinHash signatures), and
    (2) a shingle-keyed self equi-join for exact intersection counts —
    never all-pairs on rows; a shingle shared by all S sources fans out
    to at most S(S-1)/2 pair rows, so the join output is bounded by
    |distinct shingles| x S^2 with S small. Zero-intersection pairs are
    restored by a broadcast cross of the per-source size table.

    ``hash_tier`` picks the signature hash family: ``"md5"`` (default)
    is the oracle-portable tier (DuckDB computes identical digests);
    ``"xxhash64"`` is the production tier — one 64-bit xxhash per
    (i, shingle) instead of a 128-bit md5 + hex-prefix parse, roughly
    halving the per-shingle signature cost (guide §2.3, cheaper hash
    for the same uniform-argmin statistics). Exact columns (n_a, n_b,
    n_common, jaccard) are bit-identical across tiers; only the
    ``minhash_est`` estimator's randomness source changes (both are
    per-i independent permutations; the identical-sets → est 1.0
    invariant is pinned by test for both tiers).
    """
    from .dedup import _MAX_NUM_HASHES, _shingler

    if num_hashes > _MAX_NUM_HASHES:
        raise ValueError(
            f"num_hashes={num_hashes} exceeds {_MAX_NUM_HASHES} — keep the "
            "per-hash md5 column fan-out bounded"
        )
    # Materialize the distinct (source, shingle) table ONCE: it feeds
    # FOUR consumers (signatures, sizes, both sides of the intersection
    # self-join) — without the checkpoint each consumer re-runs the
    # corpus explode + distinct (4 scans, 4 wide shuffles; measured 12.5s
    # -> ~4s at sf0.1). Same pattern as cluster._prepared_vectors.
    # The respread before the checkpoint pins every consumer's width
    # (guide §2.5's AQE blind spot): the distinct's byte-small shuffle
    # is AQE-coalesced to a handful of partitions, and the checkpoint
    # freezes that — so the k-hashes-per-shingle signature aggregate ran
    # its partial mins on 4 of 32 cores (measured ~10 s CPU at sf0.1).
    # Hash repartition on the shingle key: deterministic, no
    # sort-before-repartition, and min/count aggregates are
    # order-independent so outputs are unchanged.
    target = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(_shingler(shingle_size, False)(F.col(text_col))).alias(
                "shingle"
            ),
        )
        .distinct()
        .repartition(target, "shingle")
        .transform(materialize_lazy)  # the final action computes it once
    )
    # per-i INDEPENDENT permutations (re-keyed per hash index), not the
    # affine h1 + i*h2 family the doc-level LSH uses: affine argmins
    # are correlated across i (the globally-smallest h2 shingle wins
    # every large i), which collapses the estimator's variance story on
    # small sets; here the estimate IS the deliverable, so pay the k
    # per-shingle hashes (md5 tier) — or k xxhash64s (production tier)
    if hash_tier == "md5":
        def _mh(i: int):
            return F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"mh{i}|"), F.col("shingle"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
    elif hash_tier == "xxhash64":
        def _mh(i: int):
            return F.xxhash64(F.concat(F.lit(f"mh{i}|"), F.col("shingle")))
    else:
        raise ValueError(
            f"hash_tier must be 'md5' or 'xxhash64', got {hash_tier!r}"
        )
    sig = sh.groupBy("source").agg(
        *[F.min(_mh(i)).alias(f"mh{i}") for i in range(num_hashes)]
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n"))

    a, b = sizes.alias("a"), sizes.alias("b")
    pairs = a.join(
        F.broadcast(b), F.col("a.source") < F.col("b.source")
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
    )
    x, y = sh.alias("x"), sh.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.shingle") == F.col("y.shingle"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sig.alias("sa"), sig.alias("sb")
    est = sa.join(
        F.broadcast(sb), F.col("sa.source") < F.col("sb.source")
    ).select(
        F.col("sa.source").alias("source_a"),
        F.col("sb.source").alias("source_b"),
        sum(
            (F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}")).cast("long")
            for i in range(num_hashes)
        ).alias("__matched"),
    )
    out = (
        pairs.join(F.broadcast(inter), ["source_a", "source_b"], "left")
        .join(F.broadcast(est), ["source_a", "source_b"])
        .withColumn("n_common", F.coalesce("n_common", F.lit(0)))
    )
    denom = (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double")
    return out.select(
        "source_a",
        "source_b",
        "n_a",
        "n_b",
        "n_common",
        (F.round(F.col("n_common") / denom, 6) + F.lit(0.0)).alias("jaccard"),
        (
            F.round(F.col("__matched") / F.lit(float(num_hashes)), 6)
            + F.lit(0.0)
        ).alias("minhash_est"),
    )
