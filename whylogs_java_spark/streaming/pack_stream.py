"""Streaming concat-and-chunk packing assignment.

The streaming half of ``operators.text.pack_assign`` — the shard writer
that packs an ordered ingest feed into fixed-size training contexts as
it arrives. State is ONE counter row per stratum: (docs_so_far,
next_token_offset); each micro-batch sorts its rows by id WITHIN the
batch, appends them to the stratum's stream, and emits the same per-doc
assignment schema as the batch operator.

SEMANTICS CONTRACT (documented, inherent to packing): batch
``pack_assign`` packs in GLOBAL id order; a stream can only pack in
ARRIVAL order. The two agree exactly when the feed delivers ids in
non-decreasing order across micro-batches (the ordered-ingest regime —
e.g. an append-only staging directory consumed file-by-file, each file
id-ordered, which is precisely what ``sources.shards`` exports). The
batch-equivalence pytest pins THAT regime; under out-of-order arrival
the stream still packs gaplessly and deterministically per boundary
sequence, but offsets differ from the batch answer by construction —
the same caveat any streaming shard writer carries.

Scale shape: one stateful shuffle on the stratum key; state is O(strata)
(two longs each), never per-doc; per-batch work is Arrow-batched pandas
(token counts + a running cumsum), no per-row Python round trips. The
within-stratum sequentiality is the packing contract itself — parallelism
comes from strata (or shard-then-pack, as in the batch operator).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "stratum string, doc_id long, n_tokens long, token_offset long, "
    "first_context long, last_context long, n_contexts long"
)
STATE_SCHEMA = "n_docs long, next_offset long"


def _n_tokens(text: str) -> int:
    # the batch tokens() twin: split on single spaces, drop empties
    if not isinstance(text, str):
        return 0
    return sum(1 for w in text.split(" ") if w)


def _pack_fn(context_len: int, sep_tokens: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (stratum,) = key
        if state.exists:
            n_docs, off = state.get
        else:
            n_docs, off = 0, 0
        rows: list[tuple] = []
        parts = [p for p in pdfs if len(p)]
        if not parts:
            state.update((n_docs, off))
            yield pd.DataFrame(
                columns=[
                    "stratum", "doc_id", "n_tokens", "token_offset",
                    "first_context", "last_context", "n_contexts",
                ]
            )
            return
        batch = pd.concat(parts, ignore_index=True).sort_values("doc_id")
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            if n_docs > 0:
                off += sep_tokens
            t = _n_tokens(text)
            first = off // context_len
            last = (off + t - 1) // context_len if t > 0 else first
            rows.append(
                (
                    stratum,
                    int(doc_id),
                    t,
                    off,
                    first,
                    last,
                    (last - first + 1) if t > 0 else 0,
                )
            )
            off += t
            n_docs += 1
        state.update((n_docs, off))
        yield pd.DataFrame(
            rows,
            columns=[
                "stratum", "doc_id", "n_tokens", "token_offset",
                "first_context", "last_context", "n_contexts",
            ],
        )

    return fn


def pack_assign_stream(
    stream_df: DataFrame,
    text_col: str,
    id_col: str,
    stratum_col: str,
    context_len: int = 512,
    sep_tokens: int = 0,
) -> DataFrame:
    """Per-doc packing assignments over a streaming corpus (see module
    docstring for the ordered-ingest equivalence contract).

    Output: (stratum, doc_id, n_tokens, token_offset, first_context,
    last_context, n_contexts) — the batch ``pack_assign`` schema with
    the stratum key named ``stratum``.
    """
    if context_len <= 0:
        raise ValueError("context_len must be positive")
    src = stream_df.select(
        F.col(stratum_col).cast("string").alias("stratum"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return src.groupBy("stratum").applyInPandasWithState(
        _pack_fn(context_len, sep_tokens),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
