"""Streaming EMBEDDING near-duplicate flagging: stateful hyperplane-
bucket ownership — the embedding twin of
``streaming/dedup_near_stream`` (text MinHash bands).

As vectors arrive, each is flagged against everything seen before it:
the online regime of an ingestion pipeline dropping semantic near-dups
before they reach the training shard. Signatures are the batch
production tier's banded hyperplane buckets (``similarity.
banded_buckets`` base formula — the same md5-derived ±1 planes and
strict left-to-right double folds), so batch and stream agree on
bucket membership exactly.

Mechanics:

1. per vector: ``bands`` independent ``planes``-bit bucket strings.
   The dimensionality is a REQUIRED parameter so each plane's ±1 sign
   array is a constant-folded literal in the stream projection — no
   stream-derived lengths table (which would be a second stateful op),
   no per-row md5 derivation;
2. explode to (band, bucket, id) and group on (band, bucket) — the SAME
   key the batch candidate stage self-joins on;
3. ``applyInPandasWithState`` holds one (bucket → owner id) row per
   seen signature; later arrivals emit (id, dup_of=owner, band)
   candidate rows, owners emit nothing. NULL / wrong-length vectors are
   dropped before hashing (they have no geometry; batch assigns them no
   usable bucket).

A vector colliding in ANY band flags (the OR-construction). Downstream
drops flagged ids outright (high-recall ingestion) or exact-verifies
cosine against a vector store — a point lookup, not a corpus join.
State is one tiny row per distinct (band, bucket); ``state_ttl``
bounds it to a rolling horizon for endless streams (same contract and
caveats as the text twin — a TTL'd query needs a processing-time
trigger).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from ..operators.similarity import _plane_component
from ._state import parse_state_ttl

OUT_SCHEMA = "vec_id long, dup_of long, band int"
_STATE_SCHEMA = "owner long"


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "vec_id": pd.Series([], dtype="int64"),
            "dup_of": pd.Series([], dtype="int64"),
            "band": pd.Series([], dtype="int32"),
        }
    )


def _bucket_owner_factory(ttl_ms: int | None):
    def fn(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            yield _empty_out()
            return
        rows: list[tuple] = []
        owner = state.get[0] if state.exists else None
        for pdf in pdfs:
            # arrival order within a micro-batch is not meaningful; the
            # min id is the deterministic first-owner
            for vec_id, band in sorted(zip(pdf["vec_id"], pdf["band"])):
                if owner is None:
                    owner = int(vec_id)
                elif int(vec_id) != owner:
                    rows.append((int(vec_id), owner, int(band)))
        state.update((owner,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield (
            pd.DataFrame(rows, columns=["vec_id", "dup_of", "band"])
            if rows
            else _empty_out()
        )

    return fn


def dedup_embedding_stream(
    stream_df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    bands: int = 2,
    state_ttl: str | int | None = None,
) -> DataFrame:
    """(vec_id, dup_of, band) candidate rows for later-arriving vectors
    that share a hyperplane bucket with an earlier owner, in any band."""
    vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    good = stream_df.select(F.col(id_col).alias("vec_id"), vecd.alias("__v")).where(
        F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == dim)
    )

    def sign_array(p: int):
        # literal-input md5 exprs: constant folding collapses each
        # array to a literal at plan time — zero per-row hash work
        return F.array(*[_plane_component(p, F.lit(d)) for d in range(dim)])

    def bit(p: int):
        dot = F.aggregate(
            F.zip_with(F.col("__v"), sign_array(p), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    band_buckets = F.array(
        *[
            F.concat(*[bit(b * planes + i) for i in range(planes)])
            for b in range(bands)
        ]
    )
    exploded = good.select(
        "vec_id", F.posexplode(band_buckets).alias("band", "bucket")
    )

    ttl_ms, timeout = parse_state_ttl(state_ttl)

    return exploded.groupBy("band", "bucket").applyInPandasWithState(
        _bucket_owner_factory(ttl_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
