"""Bucket-level checkpoint/resume for the quality-filter pipeline.

North-rule requirement: "resumable from an Iceberg snapshot checkpoint".
The protocol is engine-agnostic:

* the input is split into ``n_buckets`` deterministic buckets by
  ``pmod(xxhash64(url), n_buckets)`` — a pure column expression, so bucket
  membership is stable across runs and cluster sizes;
* each completed bucket commits (a) its output data and (b) a state row
  ``(bucket, n_docs, n_kept, snapshot)`` — with Iceberg, (a)+(b) ride one
  snapshot commit and ``snapshot`` records ``snapshot_id()``; on plain
  parquet (this sandbox has no Iceberg jars) the state is a
  one-file-per-bucket marker directory, which is equally atomic at the
  bucket granularity;
* resume = read state, skip completed buckets, process the rest.

Crash-consistency note: a bucket is only marked done AFTER its output
write commits, so a crash mid-bucket re-processes that bucket from
scratch (idempotent: output path is per-bucket, overwrite mode).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_col(n_buckets: int, key: str = "url"):
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")


@dataclass
class BucketState:
    bucket: int
    n_docs: int
    n_kept: int


class CheckpointStore:
    """Filesystem-marker implementation (one JSON file per completed
    bucket). Swap for an Iceberg state table by overriding
    mark_done/completed."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _path(self, bucket: int) -> str:
        return os.path.join(self.state_dir, f"bucket-{bucket:05d}.json")

    def completed(self) -> dict[int, BucketState]:
        out: dict[int, BucketState] = {}
        for f in sorted(os.listdir(self.state_dir)):
            if f.startswith("bucket-") and f.endswith(".json"):
                with open(os.path.join(self.state_dir, f)) as fh:
                    d = json.load(fh)
                out[d["bucket"]] = BucketState(d["bucket"], d["n_docs"], d["n_kept"])
        return out

    def mark_done(self, state: BucketState) -> None:
        tmp = self._path(state.bucket) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "bucket": state.bucket,
                    "n_docs": state.n_docs,
                    "n_kept": state.n_kept,
                },
                fh,
            )
        os.replace(tmp, self._path(state.bucket))  # atomic rename

    def reset(self) -> None:
        for f in os.listdir(self.state_dir):
            if f.startswith("bucket-"):
                os.remove(os.path.join(self.state_dir, f))


def run_resumable(
    pipeline,
    df: DataFrame,
    output_path: str,
    state_dir: str,
    n_buckets: int = 16,
    lineage_path: Optional[str] = None,
) -> list[BucketState]:
    """Process the input bucket-by-bucket with resume.

    Each bucket is an independent Spark job over ``WHERE bucket = i`` —
    with an Iceberg/bucketed source this prunes files; on raw parquet it
    is a full-scan filter per bucket, so keep ``n_buckets`` modest (the
    unit of loss on crash, not a parallelism knob — parallelism inside a
    bucket is Spark's)."""
    store = CheckpointStore(state_dir)
    done = store.completed()
    states: list[BucketState] = list(done.values())
    bucketed = df.withColumn("__bucket", bucket_col(n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        part = bucketed.where(F.col("__bucket") == b).drop("__bucket")
        res = pipeline.run(
            part,
            output_path=os.path.join(output_path, f"bucket={b}"),
            lineage_path=(
                os.path.join(lineage_path, f"bucket={b}") if lineage_path else None
            ),
        )
        st = BucketState(b, res.n_input, res.n_kept)
        store.mark_done(st)
        states.append(st)
    return sorted(states, key=lambda s: s.bucket)


def run_resumable_snapshots(
    pipeline,
    df: DataFrame,
    table,
    n_buckets: int = 16,
) -> list[BucketState]:
    """Snapshot-checkpoint resume (sources/snapshots.py): each completed
    bucket commits ONE atomic snapshot append to ``table`` — kept rows
    and the bucket's stats travel in the same manifest, so "output
    visible" and "bucket recorded done" are a single linearization
    point (the exact property the bucket-marker variant above only
    approximates with ordered writes). Resume = read the snapshot log,
    skip recorded buckets; a crash mid-bucket leaves only unreferenced
    data files, invisible to every reader until ``table.vacuum()``.

    The kept-row metrics ride a ``df.observe`` on the same write job —
    no second pass over the bucket."""
    from pyspark.sql import Observation

    done = {
        int(s.properties["bucket"])
        for s in table.snapshots()
        if "bucket" in s.properties
    }
    states = [
        BucketState(
            int(s.properties["bucket"]),
            int(s.properties["n_docs"]),
            int(s.properties["n_kept"]),
        )
        for s in table.snapshots()
        if "bucket" in s.properties
    ]
    bucketed = df.withColumn("__bucket", bucket_col(n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        part = bucketed.where(F.col("__bucket") == b).drop("__bucket")
        annotated = pipeline.annotate(part)
        obs = Observation(f"bucket_{b}")
        observed = annotated.observe(
            obs,
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        txn = table.new_append()
        txn.write(observed.where(F.col("keep")))
        m = dict(obs.get)
        st = BucketState(b, int(m["n_docs"] or 0), int(m["n_kept"] or 0))
        txn.commit(
            {"bucket": b, "n_docs": st.n_docs, "n_kept": st.n_kept}
        )
        states.append(st)
    return sorted(states, key=lambda s: s.bucket)
