"""Range-clustered data layout — file skipping for selective scans.

Bucketing (sources/bucketing.py) co-locates JOIN keys; this module covers
the other storage lever at 100-TB scale: laying data out so SELECTIVE
scans touch few files. Parquet readers prune with file/row-group min-max
statistics, but statistics only help if values are CLUSTERED — a column
scattered uniformly across every file has each file's [min, max] spanning
the whole domain and nothing is skipped. ``repartitionByRange`` +
``sortWithinPartitions`` makes every output file own a narrow value range
(hosts, languages, dates), so a pushed-down predicate skips all but the
overlapping files at the scan — before any row is read.

This is the honest Spark/parquet analogue of Iceberg's sort-order table
property and the classic Z-order motivation (single-dimension form; for
multi-column clustering, lead with the most-filtered column — range
partitioning is lexicographic).

``cluster_stats`` reads ONLY parquet footers (driver-side metadata, no
data I/O) to audit a layout: per-file min/max of the cluster column and
the overlap factor — the expected number of files a random point
predicate must read. 1.0 is perfect clustering; ~n_files means the
layout does nothing for that column.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-clustered on ``cluster_cols``:
    rows are range-partitioned (one contiguous key range per output
    file) and sorted within each file (tight ROW-GROUP statistics too,
    so even intra-file skipping works for large files).

    ``num_files`` bounds output file count (defaults to the session's
    shuffle parallelism). Range partitioning samples key quantiles, so
    skewed keys still yield balanced files — a hot host spreads over
    several consecutive files rather than one giant one.
    """
    if not cluster_cols:
        raise ValueError("cluster_cols must be non-empty")
    part = (
        df.repartitionByRange(num_files, *cluster_cols)
        if num_files
        else df.repartitionByRange(*cluster_cols)
    )
    part.sortWithinPartitions(*cluster_cols).write.mode(mode).parquet(path)


@dataclass(frozen=True)
class ClusterStats:
    n_files: int
    per_file: list[tuple[str, object, object]]  # (file, min, max)
    overlap_factor: float  # avg files overlapping a random point


def cluster_stats(path: str, column: str) -> ClusterStats:
    """Audit a parquet directory's clustering on ``column`` from footer
    metadata only (no data I/O): per-file min/max and the mean number
    of files whose [min, max] contains each file's own midpoint — the
    expected file-read amplification of a point predicate."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    per_file: list[tuple[str, object, object]] = []
    for f in files:
        md = pq.read_metadata(f)
        lo, hi = None, None
        idx = None
        schema = md.schema
        for i in range(len(schema.names)):
            if schema.names[i] == column:
                idx = i
                break
        if idx is None:
            raise ValueError(f"column {column!r} not in {f}")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None or st.min < lo else lo
            hi = st.max if hi is None or st.max > hi else hi
        per_file.append((os.path.basename(f), lo, hi))
    spans = [(lo, hi) for _, lo, hi in per_file if lo is not None]
    if not spans:
        return ClusterStats(len(files), per_file, 0.0)
    hits = 0
    for lo, hi in spans:
        probe = lo  # a point inside this file's range
        hits += sum(1 for lo2, hi2 in spans if lo2 <= probe <= hi2)
    return ClusterStats(
        len(files), per_file, round(hits / len(spans), 3)
    )


def zorder_key(
    cols: list, bounds: list[tuple[float, float]], bits: int = 8
):
    """Z-order (Morton) key over N numeric dimensions as ONE codegen
    column expression: each column is quantized to ``bits`` equal-width
    buckets over its [min, max] ``bounds`` (NULL → bucket 0, values
    clamped), then the bucket bits are interleaved column-round-robin —
    points close in EVERY dimension land close on the key, so range
    clustering on it gives min-max file skipping on ALL the columns at
    once instead of only the leading one (the Z-order motivation;
    public design: Morton 1966, Delta OPTIMIZE ZORDER BY).

    Equal-width quantization is deliberate: it needs only a 1-row
    min/max aggregate (no per-column global sort) and is
    engine-reproducible. Heavily skewed dimensions get fewer effective
    buckets — pre-transform (log, rank) such columns, or pass explicit
    ``bounds`` covering the hot range.
    """
    from pyspark.sql import functions as F

    if len(cols) != len(bounds):
        raise ValueError("cols and bounds must align")
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    nb = 1 << bits
    qs = []
    for c, (lo, hi) in zip(cols, bounds):
        c = F.col(c) if isinstance(c, str) else c
        lo_f, hi_f = float(lo), float(hi)
        span = hi_f - lo_f
        if span <= 0:
            qs.append(F.lit(0).cast("long"))
            continue
        q = F.floor(
            (c.cast("double") - F.lit(lo_f)) * F.lit(float(nb)) / F.lit(span)
        )
        q = F.least(F.greatest(q, F.lit(0)), F.lit(nb - 1))
        qs.append(F.coalesce(q, F.lit(0)).cast("long"))
    key = F.lit(0).cast("long")
    n = len(qs)
    for b in range(bits):
        for j, q in enumerate(qs):
            out_pos = b * n + j
            key = key.bitwiseOR(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), out_pos)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int = 8,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` parquet Z-order-clustered on N numeric columns:
    one tiny min/max aggregate fixes the quantization bounds, rows
    range-partition + sort on the interleaved key, and every output
    file owns a compact hyper-rectangle — a selective predicate on ANY
    of the cluster columns skips most files (``cluster_stats`` audits
    each dimension). Single-column callers want :func:`write_clustered`
    (lexicographic range beats Z-order in 1-D)."""
    from pyspark.sql import functions as F

    if len(cluster_cols) < 2:
        raise ValueError(
            "zorder needs >= 2 columns; use write_clustered for one"
        )
    aggs = []
    for c in cluster_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))
    row = df.agg(*aggs).collect()[0]
    bounds = [
        (row[f"__lo_{c}"] or 0.0, row[f"__hi_{c}"] or 0.0)
        for c in cluster_cols
    ]
    z = zorder_key(cluster_cols, bounds, bits=bits)
    staged = df.withColumn("__z", z)
    part = (
        staged.repartitionByRange(num_files, "__z")
        if num_files
        else staged.repartitionByRange("__z")
    )
    part.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def write_partitioned_idempotent(
    df: "DataFrame",
    path: str,
    partition_cols: list[str],
) -> None:
    """Idempotent partitioned overwrite — the parquet-level resumability
    pattern for daily/batch corpus builds (the honest substitute for
    Iceberg's ``overwritePartitions`` while this sandbox ships no
    Iceberg jars; with jars it becomes ``writeTo(...).overwritePartitions()``
    and the call sites don't change).

    ``partitionOverwriteMode=dynamic`` (set per-WRITE via the writer
    option, not session-wide — concurrent writers keep their own
    semantics) makes ``mode("overwrite")`` replace ONLY the partitions
    present in ``df``: re-running one day's job after a mid-write crash
    replaces exactly that day's directories and leaves every other day
    untouched. Spark's default STATIC overwrite would delete the whole
    table root first — the classic footgun this wrapper exists to
    prevent (pinned by test).

    Scale notes: each task writes its own partition directories straight
    to the final location (no global move barrier); pair with a
    ``repartition(*partition_cols)`` upstream when the incoming frame
    has many tasks × partitions fan-out (small-files explosion),
    NOT inside this function — the caller knows the fan-out, this
    function must not add a shuffle behind the caller's back."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )
