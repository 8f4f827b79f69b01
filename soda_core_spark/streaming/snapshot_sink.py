"""Exactly-once streaming ingestion into the snapshot table format.

Structured Streaming's parquet sink gives exactly-once through its own
file-manifest log, but rows written there bypass the snapshot table's
commit protocol (sources/snapshots.py) — no atomic multi-file visibility,
no time travel, no CAS against other writers. This sink closes that gap
with the standard idempotent-``foreachBatch`` pattern (Structured
Streaming Programming Guide, "foreachBatch" exactly-once recipe; the
same design as Delta/Iceberg streaming sinks): each micro-batch commits
ONE snapshot stamped with its ``batch_id``; on replay after a crash the
stamp is already present and the batch is skipped, so rows land exactly
once no matter how often the engine re-delivers.

Two cooperating logs make this exact:

* the stream checkpoint (Spark's) replays unacknowledged batches with
  the SAME ``batch_id`` and source offsets;
* the snapshot chain (ours) records the highest committed batch id —
  the deduplication ledger the replay checks against.

A concurrent non-stream writer (append / compact / merge) is safe: the
batch commit CASes on its parent like every snapshot commit, and the
retry path re-reads the chain (seeing its own stamp if the first
attempt actually landed)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from soda_core_spark.sources.snapshots import CommitConflict, SnapshotTable

#: property key stamped into each batch's snapshot manifest.
BATCH_ID_PROP = "stream_batch_id"


def last_committed_batch_id(table: SnapshotTable) -> int:
    """Highest ``stream_batch_id`` on the committed chain (−1 when no
    stream batch has ever committed)."""
    return max(
        (
            int(s.properties[BATCH_ID_PROP])
            for s in table.snapshots()
            if BATCH_ID_PROP in s.properties
        ),
        default=-1,
    )


def commit_stream_batch(
    table: SnapshotTable,
    batch_df: DataFrame,
    batch_id: int,
    retries: int = 3,
) -> Optional[int]:
    """Idempotent batch commit: append ``batch_df`` as one snapshot
    stamped with ``batch_id``, unless a snapshot with this (or a later)
    stamp already exists — the crash-replay case — in which case the
    batch is acknowledged without writing. Returns the snapshot id, or
    None when skipped. ``CommitConflict`` from a concurrent writer
    retries against the new CURRENT (re-checking the stamp first)."""
    for _ in range(retries + 1):
        if batch_id <= last_committed_batch_id(table):
            return None
        try:
            return table.append(
                batch_df, properties={BATCH_ID_PROP: int(batch_id)}
            )
        except CommitConflict:
            continue
    raise CommitConflict(
        f"batch {batch_id}: could not commit after {retries} retries"
    )


def start_snapshot_sink_stream(
    stream_df: DataFrame,
    table: SnapshotTable,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Stream into a :class:`SnapshotTable` exactly once. Each
    micro-batch becomes one atomic snapshot commit; downstream batch
    readers (``table.read()``) see whole batches or nothing, can time
    travel to any batch boundary, and the resumable batch pipeline can
    pick up from the same table the stream feeds."""

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        commit_stream_batch(table, batch_df, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
