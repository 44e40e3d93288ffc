"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (whylogs-java has no joins/dedup — SURVEY.md
§2.3); these are the scale-path extensions a 100 TB corpus pipeline needs.

Design for scale:
- exact dedup: hash-groupBy — one shuffle on the content hash; no sort.
- near-dup: MinHash+LSH — shingle -> k minhashes -> b band signatures ->
  equi-join on (band, signature). The join is a *bucket join on a
  pre-hashed key*, never a cross product; candidate verification (exact
  Jaccard) only touches pairs that collide in a band. AQE handles the
  skewed "very common band" case; identical-text mega-clusters should be
  removed by exact dedup first.
- SimHash: 64-bit signed-projection fingerprint; near-dup = small Hamming
  distance. Bit arithmetic stays in JVM expressions.

Determinism: minhash uses lexicographic MIN over md5 hex digests of
(seed | shingle) — stable across engines and partitionings, so results are
oracle-checkable in DuckDB with the same formulas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_key(col: Column) -> Column:
    """Canonical content hash: md5 of whitespace-normalized lowercase text."""
    return F.md5(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicate_groups(
    df: DataFrame, text_col: str, id_col: str, key: Column | None = None
) -> DataFrame:
    """Exact-duplicate groups: (text_key, n_docs, keep_id).

    ``keep_id`` is the minimum id — the deterministic survivor. One
    hash-aggregate; at scale this is a single shuffle on the md5 key with
    map-side combine.
    """
    k = key if key is not None else content_key(F.col(text_col))
    return (
        df.select(k.alias("text_key"), F.col(id_col))
        .groupBy("text_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct content key, preserving schema."""
    keys = exact_duplicate_groups(df, text_col, id_col)
    return df.join(
        keys.select(F.col("keep_id").alias(id_col)), on=id_col, how="left_semi"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def word_shingles(text: Column, size: int = 3) -> Column:
    """Word n-gram shingles as an array column — pure JVM expressions
    (split -> transform over an index sequence -> slice+join), no explode,
    no UDF."""
    words = F.split(text, " ")
    n = F.size(words)
    return F.when(
        n >= size,
        F.transform(
            F.sequence(F.lit(1), n - size + 1),
            lambda i: F.concat_ws(" ", F.slice(words, i, size)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


# affine hash-family modulus bound: h2 is reduced below 2^55 so that
# h1 + i*h2 never overflows a signed 64-bit int for i <= 255
_H2_BOUND = 1 << 55


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: k columns mh0..mh{k-1}.

    One md5 per shingle yields two 60-bit integers (h1 from hex[1:15], h2
    from hex[16:30]); the hash family is the affine h_i = h1 + i*(h2 mod
    2^55) — k-1 adds/multiplies instead of k digests per shingle (~10x
    cheaper than hashing k times), overflow-free in signed 64-bit, and
    reproducible in any engine that can parse hex (the DuckDB oracle uses
    ('0x'||substr(md5,...))::BIGINT).
    Output: one row per doc: (id, mh0..mh{k-1} BIGINT).
    """
    sh = df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_size)).alias("shingle"),
    )
    h = F.md5("shingle")
    sh = sh.select(
        id_col,
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("h1"),
        (F.conv(F.substring(h, 16, 15), 16, 10).cast("long") % _H2_BOUND).alias("h2"),
    )
    aggs = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_band_signatures(
    signatures: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """Band signatures: (id, band, band_sig) — md5 over each band's minhashes."""
    rows_per_band = num_hashes // bands
    out = []
    for b in range(bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        out.append(
            F.struct(
                F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("band_sig")
            )
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*out)).alias("bs")
    ).select(id_col, "bs.band", "bs.band_sig")


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    The heart of the scale path: a self-equi-join on (band, band_sig) —
    shuffle on the band key only, no cross product.
    """
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    bands_df = lsh_band_signatures(sigs, id_col, num_hashes, bands)
    a = bands_df.select(
        F.col(id_col).alias("id_a"), "band", "band_sig"
    )
    b = bands_df.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        a.join(b, on=["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify_pairs(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str,
    id_col: str,
    shingle_size: int = 3,
    prune_to_candidates: bool = False,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Joins the candidate pair set against per-doc distinct shingle sets;
    |A∩B| via an equi-join on shingle, sizes via per-doc counts.
    Output: (id_a, id_b, inter, size_a, size_b, jaccard).

    ``prune_to_candidates`` semi-joins the shingle sets to docs appearing
    in a pair before exploding. Enable it when candidates are a small
    fraction of a huge corpus (the typical 100 TB regime) AND ``pairs`` is
    persisted/checkpointed — the prune consumes ``pairs`` a second time and
    the extra stage only pays off when it removes most of the explode.
    """
    src = df
    if prune_to_candidates:
        cand_ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        src = df.join(cand_ids, on=id_col, how="left_semi")
    sh = src.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), shingle_size)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    sa = sh.select(F.col("doc").alias("id_a"), "shingle")
    sb = sh.select(F.col("doc").alias("id_b"), "shingle")
    inter = (
        pairs.join(sa, on="id_a")
        .join(sb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("size_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "inter",
            "size_a",
            "size_b",
            (
                F.round(
                    F.col("inter")
                    / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                    6,
                )
                + 0.0
            ).alias("jaccard"),
        )
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
    prune_to_candidates: bool = False,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard ≥ threshold.

    With ``prune_to_candidates`` the candidate set is persisted (it gets
    consumed twice) and shingle verification is restricted to candidate
    docs — the right shape when the corpus dwarfs the candidate set; at
    cluster scale, checkpoint the candidates to a table instead of
    ``persist``. Default keeps the single-job pipeline, which is faster
    when candidates are a sizable fraction of the corpus.
    """
    pairs = minhash_candidate_pairs(df, text_col, id_col, num_hashes, bands, shingle_size)
    if prune_to_candidates:
        pairs = pairs.persist()
    verified = jaccard_verify_pairs(
        df, pairs, text_col, id_col, shingle_size, prune_to_candidates
    )
    return verified.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash as an array<int> of bits (1/0), plus hex rendering.

    Per token: xxhash64(token); bit b contributes +1 if set else -1; the
    fingerprint bit is 1 iff the signed sum is positive. All JVM-side:
    explode tokens -> 64 conditional-sum aggregates.
    Output: (id, simhash_bits array<int>, simhash_hex).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok")
    ).where(F.col("tok") != "")
    h = F.xxhash64("tok")
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    bits_arr = F.array(
        *[F.when(F.col(f"b{b}") > 0, 1).otherwise(0) for b in range(bits)]
    )
    out = sums.select(F.col(id_col), bits_arr.alias("simhash_bits"))
    # hex: 4 bits per nibble, most-significant bit first
    nibbles = [
        F.conv(
            F.concat(
                *[F.col("simhash_bits").getItem(bits - 1 - (i * 4 + j)).cast("string") for j in range(4)]
            ),
            2,
            16,
        )
        for i in range(bits // 4)
    ]
    return out.select(
        id_col, "simhash_bits", F.lower(F.concat(*nibbles)).alias("simhash_hex")
    )


def hamming_distance(bits_a: Column, bits_b: Column) -> Column:
    """Hamming distance between two equal-length bit arrays (JVM zip_with)."""
    return F.aggregate(
        F.zip_with(bits_a, bits_b, lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
