"""N vs 4N executors through a REAL Spark cluster scheduler, via
spark-submit — the most literal sandbox reading of the north rule's
"run via spark-submit --py-files on clusters of N and 4N executors".

``local-cluster[E,C,MB]`` is Spark's in-box multi-executor deployment:
E separate executor JVM processes (own heap, own GC, own python-worker
pool) registered with a real standalone-style scheduler, shuffle served
between processes over netty — everything a 2-node cluster does except
cross-machine networking. The job ships as the packaging zip through
``--py-files`` exactly as it would to a production cluster.

Levels: 1 executor × 8 cores (N) vs 4 executors × 8 cores (4N), equal
per-executor memory, identical input, identical warm-up + median-of-3
protocol (scripts/scaling_bench.py discipline). Both levels run inside
ONE health-gated window (probe ≥ 4 GB/s, CPU steal < 2 % before /
between / after; per-level timed-run spread ≤ 1.3) — the paired
protocol from BENCH/JOURNAL.md r4: a uniform host-regime factor divides
out of the in-window ratio.

Known honest caveat (also in BENCH/BASELINE.md): the two levels are NOT
core-pinned — at N, 8 task slots leave 24 physical cores of headroom
(JVM service threads + python workers run unimpeded, the N level's
best case), while 4N saturates the host. That bias makes the measured
efficiency CONSERVATIVE. The deeper host limit still applies: all
executor JVMs share ONE memory bus; a real 4N cluster multiplies
memory channels.

Usage:
    python scripts/local_cluster_scaling.py [n_docs] [--wait SECONDS]
With --wait it polls until a healthy idle window opens, then runs the
pair; appends the accepted result to BENCH/local_cluster_scaling.jsonl
and prints a JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
EXEC_MEM_MB = 12288
CORES_EACH = 8

DRIVER = r'''
import json, sys, time
from pyspark.sql import SparkSession

path, runs = sys.argv[1], int(sys.argv[2])
spark = SparkSession.builder.getOrCreate()  # master/memory from spark-submit
spark.sparkContext.setLogLevel("ERROR")
from soda_core_spark.operators.filter_pipeline import QualityFilterPipeline

web = spark.read.parquet(path)
pipe = QualityFilterPipeline()
# identical warm-up at every level: 20% forking pass + one untimed full
# pass to JIT steady state (scaling_bench.py protocol)
pipe.run(web.sample(0.2, seed=1))
pipe.run(web)
times, n = [], 0
for _ in range(runs):
    t0 = time.monotonic()
    r = pipe.run(web)
    times.append(time.monotonic() - t0)
    n = r.n_input
times.sort()
med = times[len(times) // 2] if len(times) % 2 else (
    times[len(times) // 2 - 1] + times[len(times) // 2]) / 2
execs = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
print(json.dumps({"seconds": round(med, 2), "docs": n,
                  "docs_per_second": round(n / med, 1),
                  "executors_seen": execs,
                  "timed_runs": sorted(round(t, 2) for t in times)}))
spark.stop()
'''

_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(256 * 1024 * 1024),
    "MALLOC_TRIM_THRESHOLD_": str(256 * 1024 * 1024),
}


def probe_gbps() -> float:
    import numpy as np

    b = np.empty(32_000_000)
    t0 = time.time()
    b[::512] = 1.0
    return 32_000_000 * 8 / 512 / (time.time() - t0) / 1e9


def steal_pct(window: float = 3.0) -> float:
    def read():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return v

    a = read()
    time.sleep(window)
    b = read()
    tot = sum(y - x for x, y in zip(a, b))
    return 100.0 * (b[7] - a[7]) / max(1, tot)


def other_jvms() -> bool:
    out = subprocess.run(
        ["pgrep", "-c", "-f", "java|pytest"], capture_output=True, text=True
    )
    try:
        return int(out.stdout.strip() or "0") > 0
    except ValueError:
        return True


def gate() -> dict | None:
    g, s = probe_gbps(), steal_pct()
    busy = other_jvms()  # a concurrent JVM mid-pair contaminates the ratio
    ok = g >= 4.0 and s < 2.0 and not busy
    if not ok:
        return None
    return {"probe_gbps": round(g, 2), "steal_pct": round(s, 2)}


def run_level(n_exec: int, zip_path: str, driver_py: str, input_path: str,
              runs: int = 3) -> dict:
    total_cores = n_exec * CORES_EACH
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable, **_MALLOC_ENV)
    env.pop("PYTHONPATH", None)
    cmd = [
        SPARK_SUBMIT,
        "--master", f"local-cluster[{n_exec},{CORES_EACH},{EXEC_MEM_MB}]",
        "--conf", f"spark.executor.memory={EXEC_MEM_MB - 512}m",
        "--conf", f"spark.sql.shuffle.partitions={total_cores}",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        # 1 row group per task (generated files use 4096-row groups):
        # even task waves at both levels
        "--conf", "spark.sql.files.maxPartitionBytes=4m",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.executor.extraJavaOptions="
                  "-XX:+AlwaysPreTouch -XX:+UseParallelGC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        driver_py, input_path, str(runs),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                         env=env, timeout=3600)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"level {n_exec}ex produced no JSON:\n"
                           f"{out.stderr[-2000:]}")
    r = json.loads(lines[-1])
    r["executors"] = n_exec
    return r


def main() -> int:
    args = sys.argv[1:]
    wait_s = 0
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--wait":
            wait_s = int(args[i + 1]); i += 2
        else:
            pos.append(args[i]); i += 1
    n_docs = int(pos[0]) if pos else 200_000

    sys.path.insert(0, REPO)
    from soda_core_spark.packaging import build_pyfiles_zip
    from soda_core_spark.sources.webtext_gen import write_web_pages_parquet

    input_path = write_web_pages_parquet(
        f"/tmp/soda_webtext_bench/n{n_docs}", n_docs, rows_per_file=50_000
    )
    zip_path = build_pyfiles_zip("/tmp/soda_lc_scaling/soda_core_spark.zip")
    driver_py = "/tmp/soda_lc_scaling/driver.py"
    with open(driver_py, "w") as fh:
        fh.write(DRIVER)

    deadline = time.time() + max(wait_s, 1)
    attempt = 0
    while time.time() < deadline:
        h0 = gate()
        if h0 is None or other_jvms():
            print(f"[{time.strftime('%H:%M:%S')}] window not healthy/idle; "
                  f"waiting", flush=True)
            time.sleep(60)
            continue
        attempt += 1
        try:
            r1 = run_level(1, zip_path, driver_py, input_path)
            h1 = gate()
            if h1 is None:
                print("mid-pair gate failed; pair rejected", flush=True)
                continue
            r4 = run_level(4, zip_path, driver_py, input_path)
        except RuntimeError as exc:
            print(f"attempt {attempt} failed: {exc}", flush=True)
            continue
        h2 = gate()
        spread1 = r1["timed_runs"][-1] / max(r1["timed_runs"][0], 1e-9)
        spread4 = r4["timed_runs"][-1] / max(r4["timed_runs"][0], 1e-9)
        if h2 is None or spread1 > 1.3 or spread4 > 1.3:
            print(f"pair rejected: post-gate={h2} spreads={spread1:.2f}/"
                  f"{spread4:.2f}", flush=True)
            continue
        eff = (r1["seconds"] / r4["seconds"]) / 4.0
        result = {
            "mode": "local-cluster via spark-submit --py-files",
            "n_docs": n_docs,
            "exec1x8": r1,
            "exec4x8": r4,
            "scaling_efficiency_1_to_4_executors": round(eff, 3),
            "gates": {"before": h0, "between": h1, "after": h2},
            "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH",
                               "local_cluster_scaling.jsonl"), "a") as fh:
            fh.write(json.dumps(result) + "\n")
        print(json.dumps(result))
        return 0
    print("deadline passed without an accepted pair", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
