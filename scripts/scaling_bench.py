"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels in fresh JVMs — local[8] (N) and local[32] (4N) — on
identical input; efficiency = (T_8 / T_32) / 4.

Usage: python scripts/scaling_bench.py [n_docs]
Writes results into BENCH/BASELINE.md and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import glob, json, sys, time
from pyspark.sql import SparkSession

cpus, path, runs = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
shard, n_shards = (int(sys.argv[4]), int(sys.argv[5])) if len(sys.argv) > 5 else (0, 1)
mem = sys.argv[6] if len(sys.argv) > 6 else "48g"
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .config("spark.sql.shuffle.partitions", str(cpus))
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         # ~4m splits = 1 row group per task (generated files use 4096-row
         # groups): several even task waves per core; the default 128m
         # packs row groups unevenly and stragglers gate each wave
         .config("spark.sql.files.maxPartitionBytes", "4m")
         .config("spark.driver.memory", mem)
         # pre-touch heap (variance from lazy faults + THP defrag) and use
         # the throughput collector
         .config("spark.driver.extraJavaOptions",
                 "-XX:+AlwaysPreTouch -XX:+UseParallelGC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, ".")
from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline

files = sorted(glob.glob(path + "/part-*.parquet"))
web = spark.read.parquet(*files[shard::n_shards])
pipe = QualityFilterPipeline()
# warm-up, IDENTICAL for every level (equal treatment is what makes
# the cross-level ratio honest): a 20% pass forks + imports all python
# workers, then one UNTIMED full pass drives the JVM to JIT steady
# state. Timed passes then use the MEDIAN, not the min — min-of-N is
# monotonically non-increasing in N, so unequal pass counts (or a lucky
# scheduler tail) would bias the ratio.
pipe.run(web.sample(0.2, seed=1))
pipe.run(web)
times = []
n = 0
for _ in range(runs):
    t0 = time.monotonic()
    r = pipe.run(web)
    times.append(time.monotonic() - t0)
    n = r.n_input
times.sort()
med = times[len(times) // 2] if len(times) % 2 else (
    times[len(times) // 2 - 1] + times[len(times) // 2]) / 2
print(json.dumps({"cpus": cpus, "seconds": round(med, 2),
                  "docs": n, "docs_per_second": round(n / med, 1),
                  "timed_runs": sorted(round(t, 2) for t in times)}))
"""


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# glibc arena reuse for the python UDF workers: pandas/numpy batch buffers
# exceed the default mmap threshold, so every Arrow batch mmap/munmaps
# fresh pages — gratuitous page-fault traffic (pathological on hosts with
# slow fault servicing, and measurable anywhere allocation-heavy). Raising
# the threshold keeps big buffers on the retained heap, reused across
# batches. Inherited by the JVM's forked python workers.
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(256 * 1024 * 1024),
    "MALLOC_TRIM_THRESHOLD_": str(256 * 1024 * 1024),
}


def _env() -> dict:
    e = dict(os.environ)
    e.update(_MALLOC_ENV)
    return e


def _parse(out: subprocess.CompletedProcess) -> dict:
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def run_level(cpus: int, path: str, runs: int = 2) -> dict:
    # taskset pins the WHOLE process tree (JVM + pyspark daemon workers)
    # to exactly `cpus` cores — otherwise local[8]'s python UDF workers
    # spill onto the idle 24 cores and the N-level result is inflated.
    # An "executor" in the simulated cluster = 1 core incl. its python
    # worker share, matching how a real cluster allocates containers.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", RUNNER,
           str(cpus), path, str(runs)]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=_env())
    return _parse(out)


def run_multi_executor(n_exec: int, cores_each: int, path: str, runs: int = 2) -> dict:
    """N independent executor JVMs, each pinned to its own core block,
    each processing a distinct shard of the input files concurrently —
    the closest sandbox analogue of `spark-submit` on an N-executor
    cluster (separate heaps, separate GC, separate python workers).
    Wall time = the slowest executor."""
    # SAME heap per executor at every executor count: a real cluster
    # scales out with identical container specs, so giving the 1-executor
    # level 4x the heap of each 4-executor JVM (as r1 did: 96g vs 24g)
    # hands the N level a GC advantage no cluster has. 20g x 4 fits the
    # 125 GiB host with room for page cache.
    mem = "20g"
    procs = []
    for e in range(n_exec):
        lo, hi = e * cores_each, (e + 1) * cores_each - 1
        cmd = ["taskset", "-c", f"{lo}-{hi}", sys.executable, "-c", RUNNER,
               str(cores_each), path, str(runs), str(e), str(n_exec), mem]
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
            text=True, cwd=REPO, env=_env(),
        ))
    results, wall = [], 0.0
    for p in procs:
        stdout, _ = p.communicate()
        line = [l for l in stdout.strip().splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        results.append(r)
        wall = max(wall, r["seconds"])
    docs = sum(r["docs"] for r in results)
    return {"executors": n_exec, "cores_each": cores_each,
            "seconds": round(wall, 2), "docs": docs,
            "docs_per_second": round(docs / wall, 1)}


def main() -> int:
    # Levels can run in ONE process (`scaling_bench.py 200000`) or one at
    # a time (`--only local8 --state /tmp/sb.json`, then `--assemble`) so
    # each invocation stays short and the machine is verifiably quiet for
    # every level — timing levels while anything else runs (even a
    # lower-priority background shell) distorts the ratio.
    args = [a for a in sys.argv[1:]]
    state_path = None
    only = None
    assemble = False
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--state":
            state_path = args[i + 1]; i += 2
        elif args[i] == "--only":
            only = args[i + 1]; i += 2
        elif args[i] == "--assemble":
            assemble = True; i += 1
        else:
            pos.append(args[i]); i += 1
    n_docs = int(pos[0]) if pos else 200_000
    sys.path.insert(0, ".")
    from soda_core_spark.sources.webtext_gen import write_web_pages_parquet

    path = write_web_pages_parquet(
        f"/tmp/soda_webtext_bench/n{n_docs}", n_docs, rows_per_file=50_000
    )

    state = {}
    if state_path and os.path.exists(state_path):
        with open(state_path) as fh:
            state = json.load(fh)

    # EQUAL timed-run counts per level (r1 ADVICE: min-of-N with unequal
    # N biases toward the level with more passes). JIT warm-up is handled
    # by the identical untimed warm-up passes inside RUNNER; the reported
    # figure is the median of 3 timed passes for every level.
    LEVELS = {
        "local2": lambda: run_level(2, path, runs=3),
        "local8": lambda: run_level(8, path, runs=3),
        "local32": lambda: run_level(32, path, runs=3),
        "ex1": lambda: run_multi_executor(1, 8, path, runs=3),
        "ex4": lambda: run_multi_executor(4, 8, path, runs=3),
    }
    if only is not None:
        state[only] = LEVELS[only]()
        if state_path:
            with open(state_path, "w") as fh:
                json.dump(state, fh)
        print(json.dumps({only: state[only]}))
        if not assemble:
            return 0

    if not assemble and only is None:
        for name, fn in LEVELS.items():
            state[name] = fn()

    missing = [k for k in ("local2", "local8", "local32", "ex1", "ex4")
               if k not in state]
    if missing:
        print(json.dumps({"error": "missing levels", "missing": missing}))
        return 1
    lo2, lo, hi = state["local2"], state["local8"], state["local32"]
    ex1, ex4 = state["ex1"], state["ex4"]
    efficiency = (lo["seconds"] / hi["seconds"]) / 4.0
    eff_exec = (ex1["seconds"] / ex4["seconds"]) / 4.0
    eff_low = (lo2["seconds"] / lo["seconds"]) / 4.0

    result = {
        "n_docs": n_docs,
        "local2": lo2,
        "local8": lo,
        "local32": hi,
        "scaling_efficiency_2_to_8": round(eff_low, 3),
        "scaling_efficiency_8_to_32": round(efficiency, 3),
        "exec1x8": ex1,
        "exec4x8": ex4,
        "scaling_efficiency_1_to_4_executors": round(eff_exec, 3),
    }
    print(json.dumps(result))

    md = f"""## Scaling efficiency (N vs 4N, same job, identical input)

North-rule criterion: throughput scaling efficiency ≥ 0.8 from N to 4N
executors. No real cluster exists in this sandbox, so two simulations run
on the 32-core host (see BASELINE.md):

1. **single JVM, 8 vs 32 task slots** (`local[8]` vs `local[32]`),
2. **1 vs 4 independent executor JVMs, 8 cores each** — separate heaps,
   separate GC, separate python workers, each processing a distinct shard
   of the input files concurrently; the closest analogue of
   `spark-submit` with N vs 4N executors.

Each process tree is pinned to exactly its core budget with ``taskset``
(JVM + python UDF workers share the budget, as a cluster container
would). Job: the full quality-filter pipeline (signals + langid +
perplexity + scrub + keep/drop + observe metrics) over {n_docs:,}
synthetic web_pages docs, noop sink (pure compute). Every level gets the
IDENTICAL protocol: a 20% forking warm-up + one untimed full pass, then
the MEDIAN of 3 timed full passes (equal pass counts and median, not
min, so no level can win by getting more draws).

| configuration | wall (s) | docs/s |
|---|---|---|
| local[2]  (N, uncontended) | {lo2['seconds']} | {lo2['docs_per_second']:,} |
| local[8]  (4N of local[2]) | {lo['seconds']} | {lo['docs_per_second']:,} |
| local[32] (4N of local[8]) | {hi['seconds']} | {hi['docs_per_second']:,} |
| 1 executor × 8 cores  | {ex1['seconds']} | {ex1['docs_per_second']:,} |
| 4 executors × 8 cores | {ex4['seconds']} | {ex4['docs_per_second']:,} |

* uncontended N→4N efficiency (local[2]→local[8]) = **{eff_low:.3f}**
* single-JVM slot scaling efficiency (8→32) = **{efficiency:.3f}**
* executor scaling efficiency (1→4 JVMs) = **{eff_exec:.3f}**

The executor-level number is the one comparable to the north rule's
cluster criterion; the single-JVM number additionally pays shared-heap GC
and one memory subsystem for all 32 threads, which a real 4N-executor
cluster does not.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as fh:
        fh.write(md)
    return 0


if __name__ == "__main__":
    sys.exit(main())
