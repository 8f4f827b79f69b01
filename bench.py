"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "docs_per_second": ...}

The quality-filter pipeline runs over a deterministic synthetic web_pages
table whose size scales with sf (sf0.1 → 200k docs), generated once and
cached under /tmp (generation excluded from timing). Other headline
queries run on the driver-provided TPC-H-ish parquet.
"""

from __future__ import annotations

import json
import os
import sys
import time


def host_probe_gbps() -> float:
    """Fresh-page fault-service rate: single-thread touch of never-touched
    pages. Healthy hosts sustain ≥0.5-1 GB/s; this sandbox's hypervisor
    intermittently throttles it to 0.01-0.2 GB/s for tens of minutes,
    during which allocation-heavy Spark (Arrow batches, pandas buffers)
    runs 1.5-4× slow (see BENCH/BASELINE.md). Recording the probe with
    every bench JSON lets a future regression carry its host-health
    context."""
    import time as _t

    import numpy as np

    buf = np.empty(32_000_000)
    t0 = _t.monotonic()
    buf[::512] = 1.0
    dt = _t.monotonic() - t0
    return round((buf.nbytes / dt) / 1e9, 3)


def host_steal_pct(window_s: float = 1.0) -> float:
    """CPU steal percentage over a short window — the SECOND noise mode
    of this sandbox (discovered round 4): the hypervisor can steal
    6-10 %+ of cycles from a noisy neighbor while the fresh-page probe
    reads healthy, inflating CPU-bound Spark runs up to ~1.7×. Reading
    /proc/stat twice and differencing the steal jiffies against total
    jiffies captures it."""
    import time as _t

    def read():
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)

    s0, t0 = read()
    _t.sleep(window_s)
    s1, t1 = read()
    return round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = 0.1
    n_docs = max(20_000, int(2_000_000 * sf_num))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pyspark.sql import SparkSession

    from soda_core_spark.entry_queries import REGISTRY
    from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline
    from soda_core_spark.sources.webtext_gen import write_web_pages_parquet

    probe_before = host_probe_gbps()
    steal_before = host_steal_pct()

    web_path = write_web_pages_parquet(
        f"/tmp/soda_webtext_bench/n{n_docs}", n_docs, rows_per_file=50_000
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("soda_core_spark_bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Split inputs finer than the default 128m: the generated webtext
        # files pack ~13 row groups each, and 52 row groups into 32 splits
        # gives some tasks 2 row groups and some 1 — a 2x task-size skew
        # whose stragglers dominate a 32-core wave. ~4m splits = 1 row
        # group per task, 2+ waves per core, even finish (measured 2.5-3x
        # on the pipeline at sf0.1). Same principle at cluster scale:
        # keep several task waves per core so one slow split never gates
        # the stage.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "24g"))
        # AlwaysPreTouch: fault the heap in at startup, not mid-benchmark
        # (lazy page faults + THP defrag showed up as 2-5x run variance);
        # ParallelGC: throughput collector for a batch workload
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+AlwaysPreTouch -XX:+UseParallelGC",
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # headline 1: the quality-filter pipeline (keep/drop + scrub + metrics)
    web = spark.read.parquet(web_path)
    pipeline = QualityFilterPipeline()
    # Warm-up: TWO FULL runs. They fork all N python UDF workers (32
    # simultaneous pandas imports cost ~20s the first time) AND drive
    # the JVM toward steady state — the interpreted higher-order-function
    # expressions and generated codegen classes take several full passes
    # to get C2-compiled (measured: first full run 3-10x slower than
    # warm, and convergence continues for ~5 passes). A sampled warm-up
    # is not enough. Then best-of-5 timed runs.
    pipeline.run(web)
    pipeline.run(web)
    best = None
    res = None
    for _ in range(5):
        t0 = time.monotonic()
        res = pipeline.run(web)
        dt = time.monotonic() - t0
        best = dt if best is None or dt < best else best
    timings["quality_filter_pipeline"] = round(best, 3)
    docs_per_second = round(res.n_input / best, 1)

    # headline 2..n: operator queries on the sf tables
    bench_queries = [
        "q1_pricing_summary",
        "q2_fused_metrics",
        "q3_segment_revenue",
        "q6_duplicate_arithmetic",
        "q7_window_topk",
        "q10_sessionization",
        "q11_doc_stats",
        "q13_dedup_classes",
        "q16_quality_flags",
        "q17_topk_cosine",
        "q18_minhash_near_dups",
        "q33_ngram_jaccard_pairs",
        "q34_decontamination",
        "q36_host_cap_sample",
    ]
    for name in bench_queries:
        fn, _sql = REGISTRY[name]
        # warm-up pass (plan + JIT), then best-of-2 — steady state is the
        # number comparable across rounds; cold-start is JVM noise
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best_q = None
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = time.monotonic() - t0
            best_q = dt if best_q is None or dt < best_q else best_q
        timings[name] = round(best_q, 3)

    total = round(sum(timings.values()), 3)
    probe_after = host_probe_gbps()
    steal_after = host_steal_pct()
    # one adjudicable field: the run is "healthy" iff BOTH probes clear
    # the same gates the builder's gated measurement scripts use
    # (fresh-page ≥ 4 GB/s, steal ≤ 1 %) before AND after the timed
    # section. healthy=false means absolute numbers from this run must
    # not be compared against healthy-window rounds.
    healthy = (
        min(probe_before, probe_after) >= 4.0
        and max(steal_before, steal_after) <= 1.0
    )
    print(
        json.dumps(
            {
                "metric": "total_headline_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_num,
                "docs_per_second": docs_per_second,
                "pipeline_docs": res.n_input,
                "pipeline_kept": res.n_kept,
                "cpus": cpus,
                "healthy": healthy,
                # host-health detail: fresh-page fault-service GB/s before
                # and after the timed section (healthy ≥ ~0.5; degraded
                # windows explain slow absolute numbers — do not compare
                # rounds across different regimes)
                "host_probe_gbps": probe_before,
                "host_probe_gbps_after": probe_after,
                "host_steal_pct": steal_before,
                "host_steal_pct_after": steal_after,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
