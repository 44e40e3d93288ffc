"""Streaming → wire-profile sink: incremental profile maintenance.

The missing half of the reference's batch+stream claim: continuously
profile a stream and keep wire-compatible profiles on disk. Spark-first
shape: ``foreachBatch`` writes each micro-batch's grouped profile as one
delimited DatasetProfileMessage file; because profile atoms are exact
mergeable aggregates, the second-phase ``merge_profile_bins`` folds any
set of batch files into the profile of the full stream — the same
merge-equals-whole invariant the batch engine pins, now across time.

At scale: each micro-batch profile is O(groups × columns) regardless of
batch row count, so the sink directory grows with batch COUNT, not data
volume; compaction is itself ``merge_profile_bins`` (idempotent, cheap),
run whenever file count matters.
"""

from __future__ import annotations

from collections.abc import Sequence


def wire_profile_batch_writer(
    out_dir: str,
    group_by: Sequence[str],
    session_id: str = "whylogs-java-spark-stream",
    null_strings: Sequence[str] = (),
    include_sketches: bool = True,
    frequent_items_k: int = 128,
    chunk_bytes: int | None = None,
):
    """Build a ``foreachBatch`` function writing per-batch wire profiles.

    Usage::

        q = (stream_df.writeStream
             .foreachBatch(wire_profile_batch_writer("/profiles", ["lang"]))
             .start())

    Files land as ``{out_dir}/batch-<id>.bin``; ``batch_id`` doubles as
    the session timestamp so re-merged profiles order deterministically.
    Empty micro-batches write nothing. foreachBatch is at-least-once
    under recovery: a replayed batch overwrites its own file (same
    batch_id → same path), keeping the directory exactly-once.
    """
    from ..sources.protobuf import write_profile_bin

    def write_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_profile_bin(
            batch_df,
            f"{out_dir}/batch-{batch_id:08d}.bin",
            group_by=list(group_by),
            session_id=session_id,
            session_timestamp=int(batch_id),
            null_strings=null_strings,
            include_sketches=include_sketches,
            frequent_items_k=frequent_items_k,
            chunk_bytes=chunk_bytes,
        )

    return write_batch
