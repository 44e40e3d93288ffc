"""Embedding quantization planning stats.

Before shipping a 100 TB embedding corpus to a vector store, a pipeline
decides whether int8 (or int4) quantization is acceptable by measuring,
per dimension, the value range, the derived affine scale, and the
reconstruction error it would incur. This operator produces that table
in one pass shape: explode to (dim, value), per-dim min/max census (64
keys — the shuffle carries 64-key partial aggregates, nothing else),
broadcast the census back, and aggregate errors per dim.

Cross-engine determinism (the oracle contract):
- min/max/count are exact;
- the quantization level is ``floor((v - min) / scale + 0.5)`` clamped
  to [0, 2^bits - 1] — ``floor`` is exact in IEEE, unlike round(), whose
  half-way rule differs across engines;
- ``max_abs_err`` is a max of doubles (order-independent);
- ``mean_abs_err`` would be a shuffled double sum (order-nondeterministic),
  so errors accumulate as exact integers: ``floor(err * 1e9)`` summed as
  BIGINT (errors are bounded by the dim's scale, so 1e9 keeps 9+ digits
  of precision without overflow at any corpus size below ~9e9 rows/dim;
  the same magnitude-tiered-exact-sum idea as functions/metrics.py).

No reference counterpart (whylogs-java profiles scalars, not vectors);
this extends the similarity/embedding family (SURVEY.md §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ERR_SCALE = 1_000_000_000  # exact-integer error accumulator resolution


def quantize_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-dimension affine-quantization table + reconstruction error.

    Output: (dim, n, vmin, vmax, scale, max_abs_err, mean_abs_err) with
    dim 0-based. Constant dimensions (vmin == vmax) quantize losslessly
    to level 0: scale is 0 and errors are 0 by definition.
    """
    levels = (1 << bits) - 1
    flat = embeddings.select(
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("dim", "v")
    )
    census = flat.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(float(levels))
    census = census.withColumn("scale", scale)
    q = F.least(
        F.lit(float(levels)),
        F.greatest(
            F.lit(0.0),
            F.floor((F.col("v") - F.col("vmin")) / F.col("scale") + F.lit(0.5)).cast(
                "double"
            ),
        ),
    )
    deq = F.col("vmin") + q * F.col("scale")
    err = F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(
        F.abs(F.col("v") - deq)
    )
    return (
        flat.join(F.broadcast(census), "dim")
        .select("dim", "n", "vmin", "vmax", "scale", err.alias("__err"))
        .groupBy("dim", "n", "vmin", "vmax", "scale")
        .agg(
            F.max("__err").alias("max_abs_err"),
            (
                F.round(
                    F.sum(
                        F.floor(F.col("__err") * F.lit(float(_ERR_SCALE))).cast(
                            "long"
                        )
                    )
                    / (F.col("n") * F.lit(float(_ERR_SCALE))),
                    6,
                )
                + 0.0
            ).alias("mean_abs_err"),
        )
        .select(
            "dim",
            "n",
            "vmin",
            "vmax",
            (F.round("scale", 6) + 0.0).alias("scale"),
            (F.round("max_abs_err", 6) + 0.0).alias("max_abs_err"),
            "mean_abs_err",
        )
    )
