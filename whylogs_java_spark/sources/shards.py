"""Training-shard export: the last mile of a pre-training data pipeline.

A cleaned corpus leaves the engine as a deterministic set of
token-budgeted parquet shards plus a manifest — the unit a training
job's data loader consumes. Everything here is a pure function of
(id, salt, shard count):

- shard count comes from ONE corpus aggregate (total tokens /
  ``target_tokens_per_shard``) — a single driver scalar, never a
  driver-side loop;
- shard assignment is the same engine-portable md5-prefix family the
  samplers use, taken over the full 60-bit prefix (see ``_shard_key``):
  a pure projection, no shuffle beyond the final
  ``repartition("shard")`` that gives each shard exactly one output
  task/file;
- the manifest (shard, n_docs, n_tokens) is a bounded aggregate written
  next to the data.

Re-running the export over the same corpus reproduces byte-identical
assignments; appending to a corpus does NOT preserve old assignments
when the shard count changes (shard count is derived from total size —
pin ``n_shards`` explicitly for incremental regimes and the assignment
becomes append-stable like ``assign_splits``).

At 100 TB: ``target_tokens_per_shard`` bounds every output file; the
single wide operation is the one Exchange on the shard id (as many
distinct keys as shards, uniformly loaded by hash construction).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _shard_key(id_col, salt: str):
    """Deterministic 60-bit uniform integer from a row id (full md5
    15-hex-char prefix, NOT the mod-1e6 ``sample_key``): taking
    ``% n_shards`` of the already-reduced 1e6 key-space would carry a
    visible modulo bias whenever n_shards ∤ 1e6 and degenerate to empty
    shards for n_shards > 1e6; mod-2^60 bias is < 2^-40 for any
    realistic shard count."""
    h = F.md5(F.concat(F.lit(salt), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def assign_shards(
    df: DataFrame,
    id_col: str,
    token_col: str,
    n_shards: int | None = None,
    target_tokens_per_shard: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Add a ``shard`` column (0..n_shards-1), deterministic in (id, salt).

    Pass ``n_shards`` directly, or ``target_tokens_per_shard`` to derive
    it from one corpus aggregate: ceil(total_tokens / target).
    """
    if (n_shards is None) == (target_tokens_per_shard is None):
        raise ValueError("pass exactly one of n_shards / target_tokens_per_shard")
    if n_shards is None:
        total = df.agg(
            F.sum(F.col(token_col).cast("long")).alias("t")
        ).first()["t"]
        n_shards = max(1, math.ceil((total or 0) / target_tokens_per_shard))
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    return df.withColumn(
        "shard", (_shard_key(F.col(id_col), salt) % n_shards).cast("int")
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    token_col: str,
    n_shards: int | None = None,
    target_tokens_per_shard: int | None = None,
    salt: str = "",
) -> DataFrame:
    """Write ``{path}/data`` partitioned by shard (one file per shard)
    and ``{path}/manifest`` (shard, n_docs, n_tokens); return the
    manifest DataFrame.

    Rows within a shard are ordered by the assignment key — a
    deterministic within-shard shuffle (the "global shuffle" a training
    run wants, without a global sort: order is per-shard, which is the
    unit a loader streams anyway).
    """
    assigned = assign_shards(
        df, id_col, token_col, n_shards, target_tokens_per_shard, salt
    )
    (
        assigned.repartition(F.col("shard"))
        .sortWithinPartitions(_shard_key(F.col(id_col), salt), F.col(id_col))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{path}/data")
    )
    manifest = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("n_tokens"),
    )
    manifest.write.mode("overwrite").parquet(f"{path}/manifest")
    return manifest
