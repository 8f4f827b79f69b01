"""Structured Streaming front-end for the quality-filter pipeline.

The reference's "streaming" module is only a diagnostics fan-out registry
(streaming_orchestrator.py:12-75 — no dataflow); real stream processing is
an extension this engine adds. The same ``QualityFilterPipeline.annotate``
plan runs unchanged on a streaming DataFrame (it is pure row-level
projection + pandas UDFs — no state), so batch/stream share one code path:

* ``start_filter_stream``: readStream → annotate → partitioned parquet
  sink with checkpointing; ``availableNow`` trigger = incremental batch
  (catch-up) mode, the idiomatic replacement for hand-rolled file polling,
* ``host_window_metrics``: watermarked tumbling-window per-host pass/fail
  counts — late events beyond the watermark are dropped deterministically,
* ``start_metrics_stream``: foreachBatch hook that runs the soda-style
  contract verification on every micro-batch and appends check results to
  a metrics table (the streaming analogue of the reference's
  scan-results upload).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline

WEB_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def read_web_pages_stream(
    spark: SparkSession,
    input_path: str,
    schema: T.StructType = WEB_PAGES_SCHEMA,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_path)


def start_filter_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    pipeline: Optional[QualityFilterPipeline] = None,
    available_now: bool = True,
):
    """Stream web pages through the filter into a keep-partitioned parquet
    sink. Exactly-once via the sink checkpoint; restarts resume from the
    last committed file offset (the streaming twin of
    sources/checkpoint.py)."""
    pipeline = pipeline or QualityFilterPipeline()
    stream = read_web_pages_stream(spark, input_path)
    annotated = pipeline.annotate(stream)
    writer = (
        annotated.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("keep")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_window_metrics(
    annotated: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window lineage: per (window, host) doc/keep
    counts. Streaming-safe aggregation — state bounded by the watermark."""
    return (
        annotated.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("host"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_docs",
            "n_kept",
        )
    )


def host_running_totals(annotated: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-host cumulative doc/keep totals and keep-rate maintained across
    micro-batches — the kind of running corpus accounting the batch
    engine cannot express (state outlives any one batch).

    Scale/semantics notes:
    * state per key is three scalars (bounded, no row retention); the
      state store shuffles by host — skewed hosts cost one hot task per
      batch, upstream salting does NOT apply here because the state key
      must be the real host,
    * the update function is vectorized per Arrow batch (pandas ``sum``
      over the group's rows — no per-row Python),
    * emits one updated row per host per batch (update output mode).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "host string, n_docs bigint, n_kept bigint, keep_rate double"
    state_schema = "n_docs bigint, n_kept bigint"

    def update(key, pdfs, state: GroupState):
        n_docs, n_kept = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n_docs += len(pdf)
            n_kept += int(pdf["keep"].fillna(False).astype(bool).sum())
        state.update((n_docs, n_kept))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "n_docs": [n_docs],
                "n_kept": [n_kept],
                "keep_rate": [n_kept / n_docs if n_docs else 0.0],
            }
        )

    return (
        annotated.select("host", "keep")
        .groupBy("host")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    df: DataFrame,
    key: str = "url",
    watermark_col: str = "warc_ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first occurrence of each ``key``
    (re-crawled / replayed pages dropped), with state bounded by the
    watermark — ``dropDuplicatesWithinWatermark`` expires a key's state
    once the watermark passes its event time + delay, so unbounded-corpus
    streams don't accumulate unbounded dedup state (plain
    ``dropDuplicates`` on a stream would). The streaming twin of
    operators/dedup.exact_dedup for the ingestion front-end."""
    return df.withWatermark(watermark_col, delay).dropDuplicatesWithinWatermark([key])


def host_running_totals_tws(annotated: DataFrame) -> DataFrame:
    """Spark 4 form of :func:`host_running_totals`:
    ``transformWithStateInPandas`` with a ``StatefulProcessor`` — the
    successor API to ``applyInPandasWithState`` (typed state handles,
    timers, TTL, and the RocksDB state store with changelog
    checkpointing, which is what bounds state-restore time at 10^8 hosts).
    Same semantics: per-host cumulative doc/keep totals across
    micro-batches, one updated row per host per batch.

    Requires ``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider`` on the session (transformWithState is
    RocksDB-only); keep :func:`host_running_totals` for sessions on the
    default HDFS-backed store."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = "host string, n_docs bigint, n_kept bigint, keep_rate double"

    class HostTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_docs bigint, n_kept bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = self._totals.get() if self._totals.exists() else (0, 0)
            n_docs, n_kept = prev
            for pdf in rows:
                n_docs += len(pdf)
                n_kept += int(pdf["keep"].fillna(False).astype(bool).sum())
            self._totals.update((n_docs, n_kept))
            yield pd.DataFrame(
                {
                    "host": [key[0]],
                    "n_docs": [n_docs],
                    "n_kept": [n_kept],
                    "keep_rate": [n_kept / n_docs if n_docs else 0.0],
                }
            )

        def close(self) -> None:
            pass

    return (
        annotated.select("host", "keep")
        .groupBy("host")
        .transformWithStateInPandas(
            HostTotals(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    )


def start_metrics_stream(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    on_batch: Callable[[DataFrame, int], None],
    pipeline: Optional[QualityFilterPipeline] = None,
    available_now: bool = True,
):
    """foreachBatch hook: every micro-batch is a normal DataFrame, so the
    batch check engine (verify_contract) runs on it unchanged — per-batch
    scan results appended to a metrics table by ``on_batch``."""
    pipeline = pipeline or QualityFilterPipeline()
    stream = read_web_pages_stream(spark, input_path)
    annotated = pipeline.annotate(stream)
    writer = (
        annotated.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_near_dup_gate_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    band_store_path: str,
    schema: T.StructType = WEB_PAGES_SCHEMA,
    id_col: str = "url",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    portable_hash: bool = False,
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
):
    """Streaming MinHash near-dup gate: each micro-batch is checked
    against the PERSISTED band-key store (prior snapshots + all earlier
    batches), survivors are appended to ``output_path``, and the
    survivors' own band keys are appended to the store — so batch N+1
    near-dedups against batch N without any stream-stream join or
    unbounded operator state.

    Why ``foreachBatch`` and not a stream-static join: the gate needs
    (a) an anti-join against a store that GROWS as the stream runs
    (stream-static joins snapshot the static side per batch — that part
    is fine) and (b) the survivors' keys written back — a second sink.
    ``foreachBatch`` gives both with the batch operators reused verbatim
    (operators/dedup.incremental_minhash_dedup / corpus_band_keys);
    state lives in parquet, not the state store, so it survives restarts
    and is shared with the batch engine's snapshot dedup.

    Semantics: at-least-once on replay (a re-run batch re-appends
    survivors); exactly-once needs an ACID sink (sources/snapshots.py).
    Band-hit is LSH candidate semantics — see incremental_minhash_dedup.
    """
    from soda_core_spark.operators.dedup import (
        corpus_band_keys,
        incremental_minhash_dedup,
    )

    def on_batch(batch_df: DataFrame, _batch_id: int) -> None:
        band_type = T.StringType() if portable_hash else T.LongType()
        try:
            seen = spark.read.parquet(band_store_path)
        except Exception:  # first batch, store not created yet
            seen = spark.createDataFrame(
                [], T.StructType([T.StructField("band", band_type)])
            )
        survivors = incremental_minhash_dedup(
            batch_df,
            seen,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            portable_hash=portable_hash,
        ).persist()
        try:
            survivors.write.mode("append").parquet(output_path)
            new_bands = corpus_band_keys(
                survivors,
                text_col=text_col,
                id_col=id_col,
                num_hashes=num_hashes,
                bands=bands,
                portable_hash=portable_hash,
            ).join(seen.select("band"), "band", "left_anti")
            new_bands.write.mode("append").parquet(band_store_path)
        finally:
            survivors.unpersist()

    stream = read_web_pages_stream(
        spark, input_path, schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )
    writer = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_drift_monitor_stream(
    spark: SparkSession,
    input_path: str,
    ref_bins: list,
    drift_log_path: str,
    checkpoint_path: str,
    value: "Column",
    schema: T.StructType = WEB_PAGES_SCHEMA,
    max_files_per_trigger: Optional[int] = None,
    available_now: bool = True,
):
    """Streaming PSI drift monitor: every micro-batch's ``value``
    distribution is scored against a FROZEN reference histogram
    (``ref_bins`` = (bin, lo, hi, n_rows) tuples — e.g. collected
    ``operators/profiling.numeric_histogram`` output of last week's
    healthy corpus) and one (batch_id, n_rows, psi) row is appended to
    ``drift_log_path`` — the alerting feed for "this crawl batch's
    quality scores changed shape".

    Why ``foreachBatch``: PSI needs a per-batch aggregate compared
    against driver-held reference metadata and a second sink (the log),
    neither of which fits a built-in streaming aggregation; the batch
    operator (``psi_against_bins``) is reused verbatim, so stream and
    batch monitoring can never disagree. State is the frozen bins (no
    growth) — restart-safe by construction.

    Scale shape per batch: one partial-agg groupBy on the bin index
    (≤ n_bins aggregated rows collected — the k-means-centroid
    precedent), everything else driver arithmetic on ≤ n_bins numbers.
    """
    from soda_core_spark.operators.profiling import psi_against_bins

    bins = [tuple(b) for b in ref_bins]

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        psi, _ = psi_against_bins(batch_df, value, bins)
        spark.createDataFrame(
            [(int(batch_id), int(n), float(psi))],
            "batch_id long, n_rows long, psi double",
        ).write.mode("append").parquet(drift_log_path)

    stream = read_web_pages_stream(
        spark, input_path, schema=schema,
        max_files_per_trigger=max_files_per_trigger,
    )
    writer = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
