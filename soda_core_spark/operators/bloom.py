"""Distributed Bloom-filter membership — the 10^12-scale pre-filter for
incremental URL/content dedup.

At web scale the "have we seen this url/fingerprint before?" check cannot
be a join of the new crawl batch against the full seen-set: the seen side
is 10^12 keys and the join shuffles both. The standard fix (used by every
crawl dedup pipeline, cf. Broder & Mitzenmacher, "Network Applications of
Bloom Filters", Internet Math. 2004) is a Bloom filter built once over
the seen keys and **broadcast** to every executor: definite-new keys skip
the expensive exact path entirely, and only the tiny "maybe" slice goes
on to the exact anti-join (``dedup.incremental_exact_dedup``).

Spark-first construction — the filter itself is a DataFrame:

* build: explode each seen key into its k bit positions → pack into
  64-bit words with ``groupBy(pos div 64).agg(bit_or(1 << pos mod 64))``.
  Map-side partial aggregation collapses almost everything before the
  shuffle, whose output is ≤ m/64 rows no matter how many keys went in —
  a 2^30-bit filter is 16 M rows ≈ 256 MB, broadcastable; test scales use
  2^16.
* probe: k **broadcast** hash joins (one per hash function) against the
  packed words — zero shuffle on the batch side, no groupBy; the batch
  frame just gains a ``bloom_maybe`` boolean inside whole-stage codegen.

Engine-portability: positions come from the 60-bit md5 hash
(``dedup.portable_token_hash``) of ``key || '#' || i`` mod m, so a DuckDB
oracle reproduces membership exactly — including the false positives,
which are deterministic given (m, k, key set).

Spark's built-in ``df.stat.bloomFilter`` builds the same structure but
materializes it on the driver as an opaque JVM object — fine for one job,
useless as a *persistable, queryable* seen-set table that the next
incremental run reads back from parquet. This representation is just a
``(word, bits)`` frame: write it with any sink, union+re-OR to merge days.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from soda_core_spark.operators.dedup import portable_token_hash

DEFAULT_BITS = 1 << 16
DEFAULT_HASHES = 3


def bloom_position(key: Column, i: int, m: int) -> Column:
    """Bit position of hash function ``i`` for ``key`` (engine-portable)."""
    return portable_token_hash(F.concat(key, F.lit(f"#{i}"))) % m


def bloom_build(
    seen: DataFrame,
    key_col: str,
    m: int = DEFAULT_BITS,
    k: int = DEFAULT_HASHES,
) -> DataFrame:
    """Pack the k·|seen| bit positions into ``(word, bits)`` rows.

    Output has ≤ m/64 rows regardless of input size; the only shuffle is
    the word-keyed partial-aggregated ``bit_or``.
    """
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[bloom_position(key, i, m) for i in range(k)])
    ).alias("pos")
    exploded = seen.select(pos)
    return (
        exploded.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m: int = DEFAULT_BITS,
    k: int = DEFAULT_HASHES,
    result_col: str = "bloom_maybe",
) -> DataFrame:
    """Add ``result_col``: true iff all k bits for the key are set.

    k broadcast joins (no shuffle, no groupBy) — the batch side streams
    through unchanged. A word absent from the filter frame means no bit
    in that word was ever set → miss.
    """
    key = F.col(key_col)
    out = batch
    hits: list[Column] = []
    for i in range(k):
        out = (
            out.withColumn("__bl_pos", bloom_position(key, i, m))
            .withColumn("__bl_word", (F.col("__bl_pos") / 64).cast("long"))
            .withColumn(
                "__bl_mask",
                F.expr("shiftleft(1L, cast(__bl_pos % 64 as int))"),
            )
        )
        b = bloom.select(
            F.col("word").alias("__bl_w"), F.col("bits").alias("__bl_b")
        )
        out = out.join(
            F.broadcast(b), F.col("__bl_word") == F.col("__bl_w"), "left"
        )
        hit = F.coalesce(
            F.col("__bl_b").bitwiseAND(F.col("__bl_mask")) != 0, F.lit(False)
        )
        out = out.withColumn(f"__bl_hit{i}", hit).drop(
            "__bl_pos", "__bl_word", "__bl_mask", "__bl_w", "__bl_b"
        )
        hits.append(F.col(f"__bl_hit{i}"))
    maybe = hits[0]
    for h in hits[1:]:
        maybe = maybe & h
    return out.withColumn(result_col, maybe).drop(
        *[f"__bl_hit{i}" for i in range(k)]
    )


def bloom_merge(filters: Sequence[DataFrame]) -> DataFrame:
    """OR several same-(m,k) filters into one — the cross-day merge for
    incremental crawls: union the word frames and re-``bit_or``."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter frame")
    u = filters[0]
    for f in filters[1:]:
        u = u.unionByName(f)
    return u.groupBy("word").agg(F.bit_or("bits").alias("bits"))
