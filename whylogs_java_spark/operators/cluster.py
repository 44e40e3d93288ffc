"""Deterministic Lloyd's k-means over an embedding column — the
cluster step of cluster-based corpus curation (SemDeDup-style semantic
dedup, cluster-balanced sampling, per-cluster quality triage).

Engine-deterministic by construction, so the full assignment table is
DuckDB-oracle-checkable (the same determinism toolkit as the rest of
the embedding family):

- **seeding**: the k vectors with the smallest ``md5(id)`` (a
  deterministic uniform draw — no RNG), centroid ids 0..k-1 in that
  order;
- **distances**: squared L2 via a strict left-to-right fold over the
  dims (``F.aggregate`` ≙ DuckDB ``list_reduce`` — bit-identical IEEE
  sums);
- **argmin**: chained strictly-less comparisons, ties to the LOWEST
  centroid id;
- **centroid update**: per-dim means from EXACT integer sums
  (``floor(x·1e6 + 0.5)`` BIGINT, the corpus_report convention) so the
  new centroids are shuffle-order-independent, then two IEEE double
  divisions applied identically in both engines.

Scale shape: per iteration ONE scan with k broadcast-literal centroid
folds (k·dim literals in the plan — fine for the coarse k this is for)
plus one (k × dim)-key exact-integer aggregate whose result (k·dim
rows) collects to the driver — the same tiny-collect loop shape as the
reference's own ``estimate_segments`` driver greedy. ``n_iter`` scans
total; an empty cluster keeps its previous centroid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INT_SCALE = 1_000_000


def _sq_l2(vec_col, centroid: list[float]):
    """Strict left-to-right fold of (v[i] - c[i])^2 — order-pinned."""
    diffs = F.zip_with(
        vec_col,
        F.array(*[F.lit(float(c)) for c in centroid]),
        lambda x, y: (x - y) * (x - y),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def kmeans_assign(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, dist) after ``n_iter`` deterministic Lloyd rounds.

    ``dist`` is the squared L2 to the final assigned centroid, rounded
    to 6 decimals. Rows with NULL/empty vectors are dropped (they have
    no geometry). All vectors must share one dimensionality.
    """
    emb = embeddings.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    ).where(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
    vecd = F.transform(F.col("__v"), lambda x: x.cast("double"))
    emb = emb.select("__id", vecd.alias("__v"))

    seeds = (
        emb.orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(k)
        .collect()
    )
    if not seeds:
        return embeddings.sparkSession.createDataFrame(
            [], f"{id_col} long, cluster int, dist double"
        )
    centroids: list[list[float]] = [[float(x) for x in r["__v"]] for r in seeds]
    dim = len(centroids[0])

    def assign_expr():
        dists = [_sq_l2(F.col("__v"), c) for c in centroids]
        best_d, best_c = dists[0], F.lit(0)
        for ci in range(1, len(centroids)):
            is_less = dists[ci] < best_d
            best_c = F.when(is_less, F.lit(ci)).otherwise(best_c)
            best_d = F.when(is_less, dists[ci]).otherwise(best_d)
        return best_c, best_d

    for _ in range(n_iter):
        cid, _d = assign_expr()
        assigned = emb.select("__id", "__v", cid.alias("__cid"))
        # exact-integer per-dim sums: shuffle-order-independent means
        dims = assigned.select(
            "__cid",
            F.posexplode(
                F.transform(
                    F.col("__v"),
                    lambda x: F.floor(x * INT_SCALE + F.lit(0.5)).cast("long"),
                )
            ).alias("__pos", "__iv"),
        )
        stats = (
            dims.groupBy("__cid", "__pos")
            .agg(F.sum("__iv").alias("__s"), F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cluster.setdefault(r["__cid"], {})[r["__pos"]] = (r["__s"], r["__n"])
        new_centroids = []
        for ci in range(len(centroids)):
            comp = by_cluster.get(ci)
            if not comp:
                new_centroids.append(centroids[ci])  # empty cluster: keep
                continue
            new_centroids.append(
                [(comp[p][0] / comp[p][1]) / INT_SCALE for p in range(dim)]
            )
        centroids = new_centroids

    cid, d = assign_expr()
    return emb.select(
        F.col("__id").alias(id_col),
        cid.alias("cluster"),
        (F.round(d, 6) + F.lit(0.0)).alias("dist"),
    )


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    """(cluster, n, mean_dist) — the curation triage view."""
    return assignments.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n"),
        (F.round(F.avg("dist"), 6) + F.lit(0.0)).alias("mean_dist"),
    )
