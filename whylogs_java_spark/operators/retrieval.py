"""BM25 keyword retrieval over a document corpus.

The reference engine has no retrieval surface; this extends the
training-data-pipeline family (retrieval for RAG-style curation,
query-anchored dedup review, contamination triage) the same way the
dedup/similarity operators do: pure DataFrame ops, deterministic
scoring, and every float rounded to 6 decimals BEFORE ranking so the
DuckDB oracle replays rank-for-rank.

Scale shape (100 TB corpus, bounded query set):

- one scan of the corpus -> explode to (doc, term) -> ONE shuffle to
  (doc, term) counts with map-side partial aggregation (the token
  multiset collapses to the per-doc vocabulary, so shuffle rows are
  bounded by docs x distinct-terms-per-doc, far below token count);
- doc length rides the same doc-partitioned exchange via a window sum
  (Spark reuses the (doc, term) hash partitioning: partitionBy(doc) is
  a prefix of the groupBy key only after an explicit repartition; we
  instead derive it with a second groupBy on the already-collapsed tf
  table, which is vocabulary-bounded, then a doc-keyed join of two
  tables co-partitioned by the same key);
- document frequency + IDF is a vocabulary-sized aggregate ->
  broadcast;
- the query side (query_id, term) is tiny by construction ->
  broadcast; the postings join is map-side, touching only rows whose
  term appears in some query (Catalyst pushes the broadcast semi-join
  below the wide tf table);
- final (query, doc) score aggregation shuffles only matched postings;
  top-k per query runs as WindowGroupLimit (rank pushed into the
  shuffle) — never a global sort.

No UDFs anywhere; the whole plan is whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

__all__ = ["bm25_topk", "term_stats"]


def term_stats(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-(doc, term) whitespace-token frequencies with doc length.

    Output: (id, term, tf, dl) — ``dl`` is the total token count of the
    doc (the BM25 length norm), attached via a doc-keyed join of the
    two aggregates derived from the same exploded scan.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    return tf.join(dl, on=id_col)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str,
    id_col: str,
    query_col: str = "query_text",
    query_id_col: str = "query_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` BM25 (Robertson/Sparck-Jones) documents per query.

    score(q, d) = sum over distinct query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Determinism: scores are rounded to 6 decimals BEFORE ranking, ties
    break on ascending doc id, so the ordering (not just the values) is
    stable across engines. Output: (query_id, rank, id, score) — only
    queries with at least one matching document appear.
    """
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # corpus constants as a one-row broadcast (never a driver collect)
    corpus = tf.groupBy().agg(
        F.count_distinct(F.col(id_col)).alias("__n_docs"),
        (F.sum("tf") / F.count_distinct(F.col(id_col))).alias("__avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens(F.col(query_col)))).alias("term"),
    )

    n = F.col("__n_docs").cast("double")
    idf = F.log(
        F.lit(1.0) + (n - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfv = F.col("tf").cast("double")
    norm = F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("dl") / F.col("__avgdl")
    )
    contrib = idf * tfv * F.lit(float(k1) + 1.0) / (tfv + norm)

    # broadcast-filter the postings BEFORE the doc-keyed dl join, so the
    # only full-width shuffle joins (matched postings) x (doc lengths)
    # instead of (all postings) x (doc lengths)
    scored = (
        tf.join(F.broadcast(qterms), on="term")
        .join(F.broadcast(dfreq), on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(corpus))
        .groupBy(query_id_col, id_col)
        .agg((F.round(F.sum(contrib), 6) + F.lit(0.0)).alias("score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= F.lit(int(k)))
        .select(query_id_col, "rank", id_col, "score")
    )
