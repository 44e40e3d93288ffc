"""Streaming per-source quota gate.

The ingest-time half of ``operators.sampling.source_cap``: cap how many
documents each source/domain may contribute, enforced AT THE FIREHOSE so
a crawler burst from one hot domain never floods the staging corpus.

SEMANTICS CONTRACT (documented, inherent to streaming): batch
``source_cap`` keeps the CAP BEST rows per source (quality order over
the whole corpus); a stream cannot know future quality, so the gate
admits the first ``cap`` arrivals per source (ties within a micro-batch
broken by id order — each batch is sorted by id before counting). The
two agree exactly when ingest order matches the batch preference order
(e.g. a staging feed already sorted by the prefer column, or id-ordered
ingest against the batch default) — THAT regime is pinned by the
batch-equivalence pytest; under arbitrary arrival the stream still
enforces the cap deterministically per boundary sequence, it just keeps
earlier arrivals instead of better ones — the same caveat any
admission-control gate carries.

Scale shape: one stateful shuffle on the source key; state is ONE long
per source (admitted count) — O(distinct sources), never per-doc; the
hot-domain skew case is exactly what the cap bounds (a source stops
emitting after ``cap`` rows forever). Per-batch work is Arrow-batched
pandas with no per-row Python round trips beyond the admitted slice.

STATE-GROWTH guard (r13, the band-stream ``state_ttl`` treatment):
O(sources) state is fine for the intended domain keys, but a per-URL
(or otherwise unbounded) ``source_col`` misuse grows one state row per
distinct key forever. ``state_ttl`` drops a source's counter after
that much processing-time idleness — the quota becomes a ROLLING one
(cap per activity window, the rate-limiter regime) instead of
cap-forever; pick a TTL only when the key domain is unbounded and
first-N-forever wasn't the real contract anyway.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from ._state import parse_state_ttl

STATE_SCHEMA = "n_admitted long"


def _quota_fn(cap: int, ttl_ms: int | None, out_id: str):
    id_dtype = "object" if out_id == "string" else "int64"

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # idle source: drop its counter (rolling-quota contract)
            state.remove()
            yield pd.DataFrame(
                {
                    "source": pd.Series([], dtype="object"),
                    "doc_id": pd.Series([], dtype=id_dtype),
                    "quota_rank": pd.Series([], dtype="int64"),
                }
            )
            return
        (source,) = key
        n = state.get[0] if state.exists else 0
        rows: list[tuple] = []
        parts = [p for p in pdfs if len(p)]
        if parts:
            batch = pd.concat(parts, ignore_index=True).sort_values("doc_id")
            for doc_id in batch["doc_id"]:
                if n >= cap:
                    break
                n += 1
                rows.append((source, doc_id, n))
        state.update((n,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(rows, columns=["source", "doc_id", "quota_rank"])

    return fn


def source_cap_stream(
    stream_df: DataFrame,
    id_col: str,
    source_col: str,
    cap: int,
    state_ttl: str | int | None = None,
) -> DataFrame:
    """Admitted (source, doc_id, quota_rank) rows over a streaming
    corpus — quota_rank is the 1-based admission index within the
    source (≤ cap forever, across all micro-batches). Join back on the
    id to carry payload columns, or treat the output as the admission
    ticket table. ``state_ttl`` (e.g. ``"30 minutes"``) bounds state
    for unbounded key domains — see the module docstring's
    rolling-quota contract.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if not stream_df.isStreaming:
        raise ValueError("stream_df is not streaming — use "
                         "sampling.source_cap for batch corpora")
    # ids keep their native type (string ids are legal corpus-wide —
    # the batch twin accepts any id type); a lossy cast-to-long would
    # NULL string ids and crash the state function mid-stream
    id_type = stream_df.schema[id_col].dataType.simpleString()
    if id_type not in ("long", "int", "bigint", "integer", "string"):
        raise ValueError(
            f"unsupported id type {id_type!r} for {id_col!r} — "
            "use an integer or string id column"
        )
    out_id = "string" if id_type == "string" else "long"
    ttl_ms, timeout = parse_state_ttl(state_ttl)
    src = stream_df.select(
        F.col(source_col).cast("string").alias("source"),
        F.col(id_col).cast(out_id).alias("doc_id"),
    )
    return src.groupBy("source").applyInPandasWithState(
        _quota_fn(cap, ttl_ms, out_id),
        outputStructType=f"source string, doc_id {out_id}, quota_rank long",
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
