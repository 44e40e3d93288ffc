"""Distributed BPE tokenizer induction (Sennrich et al. 2016).

Byte-pair encoding learned FROM the corpus — the tokenizer-training leg
of a training-data pipeline (vocabulary fitted to the data that will be
packed/sharded by the rest of this engine).

Formulation for scale: BPE statistics depend only on the WORD CENSUS
(distinct word → count), never on the raw token stream — the same
reduction production trainers use. So the corpus is scanned exactly
ONCE (one explode + hash-agg to the vocabulary-sized census, map-side
combined); every merge iteration then runs over that bounded table: one
pair-count aggregate (rows ≤ census × word-length symbols) plus a
1-ROW argmax collect — the classifier-GD loop shape (driver holds k
scalars; data never leaves the cluster). ``n_merges`` iterations total,
each re-materialized so iteration i+1 reads a table, not an
i-deep lineage.

Engine-portable representation: a word's symbol sequence is the string
``|s1||s2||...||sn|`` (every symbol wrapped in its own ``|`` pair).
Applying merge (a, b) is then EXACTLY ``replace(s, '|a||b|', '|ab|')``
— leftmost non-overlapping, the BPE greedy rule — and because each
symbol carries its own delimiters, consecutive occurrences all merge in
one pass ('|a||b||a||b|' → '|ab||ab|'). Both Spark and DuckDB
``replace`` share these semantics, so the whole trainer unrolls into a
DuckDB oracle (one CTE trio per merge), the
``quality_classifier`` precedent. Words containing the delimiter or the
end-of-word marker are EXCLUDED from the census (documented; pick
different markers for corpora that use them).

Determinism: merge ties break (count DESC, left ASC, right ASC); the
census and every pair count are exact integer aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ckpt import literal_df, materialize
from ..functions.hof import let_bound

#: end-of-word marker symbol (classic BPE '</w>', one char here so the
#: census strings stay compact)
EOW = "·"
SEP = "|"


def _census_sym(w: Column) -> Column:
    """word -> '|c1||c2||...||·|' wrapped-symbol string."""
    return F.concat(
        F.lit(SEP),
        F.array_join(F.split(w, ""), SEP + SEP),
        F.lit(SEP + SEP + EOW + SEP),
    )


def _raw_census(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """(w, cnt): the distinct-word census — ONE corpus pass (explode +
    map-side-combined hash agg). Words containing the delimiter or the
    end-of-word marker are excluded (module contract)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        t = F.lower(t)
    w = F.explode(F.filter(F.split(t, " "), lambda x: x != "")).alias("w")
    return (
        df.select(w)
        .where(~F.col("w").contains(SEP) & ~F.col("w").contains(EOW))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bpe_word_census(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """(s, cnt): the wrapped-symbol census — ONE corpus pass."""
    return _raw_census(df, text_col, lowercase).select(
        _census_sym(F.col("w")).alias("s"), "cnt"
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, c): weighted adjacent-symbol pair counts over a census."""
    s = F.col("s")
    arr = F.split(s.substr(F.lit(2), F.length(s) - 2), "\\|\\|")

    def pairs(a: Column) -> Column:
        return F.when(
            F.size(a) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(a) - 1),
                lambda i: F.struct(
                    F.element_at(a, i).alias("l"),
                    F.element_at(a, i + 1).alias("r"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))

    return (
        words.select(F.col("cnt"), F.explode(let_bound(arr, pairs)).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("cnt").alias("c"))
    )


#: merge count above which ``bpe_train(method="auto")`` switches from
#: the per-merge distributed loop to the driver-census trainer — past
#: this the distributed tier costs one pair-count aggregate + argmax
#: collect + census re-materialization PER MERGE (a 32k-vocab run would
#: be ~100k Spark jobs of driver round-trips), while BPE statistics
#: depend only on the bounded word census, which the census tier
#: collects ONCE. Mirrors ``BPE_EXPR_MAX_MERGES`` on the apply leg.
BPE_DIST_MAX_MERGES = 64

#: census-size refusal for ``bpe_train(method="census")`` — the driver
#: trainer holds the distinct-word census in memory; a census larger
#: than this (distinct WORDS, not rows — Zipf keeps real corpora far
#: below it) must be pre-filtered (min-count threshold) or trained with
#: the distributed tier.
BPE_MAX_CENSUS_ROWS = 5_000_000


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int = 16,
    lowercase: bool = True,
    method: str = "auto",
    max_dist_merges: int = BPE_DIST_MAX_MERGES,
    max_census_rows: int = BPE_MAX_CENSUS_ROWS,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table (step, left, right, merged, pair_count) in training order —
    the tokenizer artifact (feed it to :func:`bpe_apply`, or export).
    Stops early if the census runs out of pairs.

    Two execution tiers, bit-identical by construction (pinned by
    test; both reduce the corpus to the same one-pass word census and
    break merge ties identically — count DESC, left ASC, right ASC):

    - **distributed** (demo merge counts, <= ``max_dist_merges``): the
      census stays in the cluster; each merge runs one pair-count
      aggregate + a 1-row argmax collect + a census re-materialization.
      This tier is what the DuckDB oracle replays (one CTE trio per
      merge) — but its job-per-merge shape cannot serve a production
      vocabulary.
    - **census** (production vocabularies): collect the bounded census
      ONCE (loud refusal past ``max_census_rows`` distinct words) and
      run the classic in-memory trainer — incremental pair-count
      updates (only words containing the fired pair are touched) and a
      lazy-deletion heap argmax, so a 32k-100k-merge run is seconds of
      driver CPU and exactly ONE Spark job, the shape production BPE
      trainers (Sennrich et al. 2016 ``learn_bpe``) use.

    ``method``: "auto" (tier by ``max_dist_merges``), "distributed",
    "census".
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if method not in ("auto", "distributed", "census"):
        raise ValueError(
            f"method must be 'auto', 'distributed' or 'census', got {method!r}"
        )
    if method == "census" or (method == "auto" and n_merges > max_dist_merges):
        return _bpe_train_census(
            df, text_col, n_merges, lowercase, max_census_rows
        )
    spark = df.sparkSession
    words = bpe_word_census(df, text_col, lowercase).transform(materialize)
    merges: list[tuple] = []
    for step in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        merges.append((step, l, r, l + r, int(c)))
        words = words.select(
            F.replace(
                F.col("s"),
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            ).alias("s"),
            "cnt",
        ).transform(materialize)
    return literal_df(
        spark,
        merges,
        "step int, left string, right string, merged string, pair_count long",
    )


def _bpe_train_census(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    lowercase: bool,
    max_census_rows: int,
) -> DataFrame:
    """Driver-census training tier (see :func:`bpe_train`).

    Collects the distinct-word census once (guarded), then trains
    in-driver with incremental pair-count maintenance: a pair→word-set
    index finds the words a fired merge touches; each touched word's
    old pair contributions are subtracted, the merge applied (leftmost
    non-overlapping — identical to the distributed tier's wrapped
    ``replace``), and the new contributions added back. Argmax is a
    lazy-deletion min-heap keyed (-count, left, right) — pop order IS
    the distributed tier's (count DESC, left ASC, right ASC) orderBy
    (UTF-8 byte order == code-point order, so Spark string sort and
    Python string sort agree). Stale heap entries are discarded by
    re-checking the live count at pop time.

    Per merge the work is O(touched words × word length) + O(changed
    pairs × log heap) — independent of corpus size and of merges
    already learned, so 32k+ merges are driver-cheap.
    """
    import heapq
    from collections import defaultdict

    spark = df.sparkSession
    census = (
        _raw_census(df, text_col, lowercase)
        .limit(max_census_rows + 1)
        .collect()
    )
    if len(census) > max_census_rows:
        raise ValueError(
            f"bpe_train(method='census'): word census exceeds "
            f"max_census_rows={max_census_rows} distinct words — "
            f"pre-filter the corpus (min-count threshold) or raise the "
            f"guard; the distributed tier (method='distributed') has no "
            f"census ceiling but costs one Spark job per merge"
        )
    words: list[list] = []  # [symbols, count] per distinct word
    pair_cnt: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for row in census:
        syms = list(row["w"])
        syms.append(EOW)
        idx = len(words)
        words.append([syms, row["cnt"]])
        for a, b in zip(syms, syms[1:]):
            pair_cnt[(a, b)] += row["cnt"]
            pair_words[(a, b)].add(idx)
    heap = [(-c, l, r) for (l, r), c in pair_cnt.items() if c > 0]
    heapq.heapify(heap)
    merges: list[tuple] = []
    for step in range(n_merges):
        top = None
        while heap:
            negc, l, r = heapq.heappop(heap)
            if pair_cnt.get((l, r), 0) == -negc and negc < 0:
                top = (l, r, -negc)
                break
        if top is None:
            break
        l, r, c = top
        merges.append((step, l, r, l + r, c))
        lr = l + r
        changed: set = set()
        for idx in list(pair_words.get((l, r), ())):
            syms, cnt = words[idx]
            if len(syms) < 2:
                continue
            for a, b in zip(syms, syms[1:]):
                pair_cnt[(a, b)] -= cnt
                changed.add((a, b))
            out, i, m = [], 0, len(syms)
            while i < m:
                if i + 1 < m and syms[i] == l and syms[i + 1] == r:
                    out.append(lr)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx][0] = out
            for a, b in zip(out, out[1:]):
                pair_cnt[(a, b)] += cnt
                changed.add((a, b))
                pair_words[(a, b)].add(idx)
        for p in changed:
            cc = pair_cnt.get(p, 0)
            if cc > 0:
                heapq.heappush(heap, (-cc, p[0], p[1]))
            else:
                pair_cnt.pop(p, None)
                pair_words.pop(p, None)
    return literal_df(
        spark,
        merges,
        "step int, left string, right string, merged string, pair_count long",
    )


#: merge-table size above which ``bpe_apply(method="auto")`` switches
#: from the chained-replace expression plan to the Arrow-batched
#: encoder — past this the expression tier's plan grows one replace
#: node PER MERGE per row (O(merges x word_len) row cost, unbounded
#: plan size), which is unusable at real 32k-100k vocabularies.
BPE_EXPR_MAX_MERGES = 64


def bpe_apply(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: DataFrame | list[tuple],
    lowercase: bool = True,
    method: str = "auto",
    max_expr_merges: int = BPE_EXPR_MAX_MERGES,
) -> DataFrame:
    """Tokenize documents with a learned merge table. Two execution
    tiers, bit-identical by construction (pinned by test):

    - **expr** (small tables, <= ``max_expr_merges``): per word, the
      merges replay IN TRAINING ORDER as chained ``replace`` calls —
      plan literals, zero joins, zero shuffle, whole-stage codegen;
      this tier is what the DuckDB oracle replays.
    - **arrow** (production vocabularies): one ``mapInPandas``
      projection over an O(vocab) rank table. Per DISTINCT word the
      encoder runs the cursor-ordered replay loop — repeatedly merge
      the lowest-rank pair *not yet passed in training order* — which
      is exactly the expression tier's semantics but O(word_len^2)
      rank lookups per word instead of O(merges x word_len) replace
      scans, so a 32k-merge table costs the same per row as a 32-merge
      one. A per-task word cache amortizes Zipf-repeated words to a
      dict hit. Same plan shape as the expr tier (one scan, zero
      shuffle, zero joins); the projection runs in Arrow batches
      instead of codegen.

    ``method``: "auto" (tier by ``max_expr_merges``), "expr", "arrow".

    Output: (id, n_tokens, tokens array<string>) — subword symbols in
    order, end-of-word marker attached to each word's last symbol.
    """
    if method not in ("auto", "expr", "arrow"):
        raise ValueError(
            f"method must be 'auto', 'expr' or 'arrow', got {method!r}"
        )
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()
        pairs = [(r["left"], r["right"]) for r in rows]
    else:
        pairs = [(m[1], m[2]) for m in sorted(merges)]
    if method == "arrow" or (method == "auto" and len(pairs) > max_expr_merges):
        return _bpe_apply_arrow(df, text_col, id_col, pairs, lowercase)
    t = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        t = F.lower(t)

    def encode(w: Column) -> Column:
        s = _census_sym(w)
        for l, r in pairs:
            s = F.replace(
                s,
                F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                F.lit(f"{SEP}{l}{r}{SEP}"),
            )
        return F.split(s.substr(F.lit(2), F.length(s) - 2), "\\|\\|")

    words = F.filter(F.split(t, " "), lambda x: x != "")
    toks = F.flatten(
        F.transform(
            F.filter(
                words,
                lambda x: ~x.contains(SEP) & ~x.contains(EOW),
            ),
            encode,
        )
    )
    # two-step select: `tokens` becomes a bound attribute before the
    # size() projection, so the replace chain runs once per row, not
    # once per output column
    return df.select(F.col(id_col), toks.alias("tokens")).select(
        F.col(id_col),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.col("tokens"),
    )


def _bpe_apply_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    pairs: list[tuple],
    lowercase: bool,
) -> DataFrame:
    """Arrow-batched encoder tier (see :func:`bpe_apply`).

    Semantics contract with the expression tier: replaying merges in
    training order, each as a single leftmost-non-overlapping pass, is
    equivalent to the cursor loop below — at each step merge the
    lowest-rank adjacent pair whose rank is >= the last-fired rank + 1
    (ranks BEHIND the cursor were already offered their pass and, per
    training order, must not fire late). The loop terminates because
    every merge shortens the symbol list. Lowercasing stays SPARK-side
    (``F.lower`` before the Arrow exchange) so the tiers share one
    casing semantic.

    The rank table requires distinct pairs (guaranteed by
    ``bpe_train``; duplicates would make rank order ambiguous) and
    ships once per executor as a broadcast, O(vocab) small.
    """
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    ranks = {}
    for i, p in enumerate(pairs):
        ranks.setdefault(p, i)
    if len(ranks) != len(pairs):
        raise ValueError(
            "merge table contains duplicate pairs — not a bpe_train "
            "artifact; the arrow tier requires distinct merges"
        )
    parts = list(pairs)
    bc = df.sparkSession.sparkContext.broadcast((ranks, parts))

    t = F.coalesce(F.col(text_col), F.lit(""))
    if lowercase:
        t = F.lower(t)
    src = df.select(F.col(id_col), t.alias("__t"))
    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_tokens", LongType()),
            StructField("tokens", ArrayType(StringType())),
        ]
    )

    def run(batches):
        ranks_, parts_ = bc.value
        cache: dict = {}

        def enc(word):
            got = cache.get(word)
            if got is None:
                syms = list(word)
                syms.append(EOW)
                cursor = 0
                while len(syms) > 1:
                    best = -1
                    for i in range(len(syms) - 1):
                        r = ranks_.get((syms[i], syms[i + 1]), -1)
                        if r >= cursor and (best < 0 or r < best):
                            best = r
                    if best < 0:
                        break
                    left, right = parts_[best]
                    lr = left + right
                    out, i, m = [], 0, len(syms)
                    while i < m:
                        if (
                            i + 1 < m
                            and syms[i] == left
                            and syms[i + 1] == right
                        ):
                            out.append(lr)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                    cursor = best + 1
                got = syms
                cache[word] = got
            return got

        for pdf in batches:
            toks = [
                [
                    s
                    for w in txt.split(" ")
                    if w and SEP not in w and EOW not in w
                    for s in enc(w)
                ]
                for txt in pdf["__t"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_tokens": pd.Series(
                        [len(x) for x in toks], dtype="int64"
                    ),
                    "tokens": toks,
                }
            )

    return src.mapInPandas(run, schema)
