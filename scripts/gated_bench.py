"""Health-gated bench.py runner: wait for a quiet host window (fresh-page
probe >= 4 GB/s AND CPU steal < 2%), run ``bench.py`` at the given SF dir,
then accept the result only if bench.py's own embedded before/after probes
are healthy too. Keeps the fastest accepted run (host noise only ever
inflates). Writes the accepted JSON line to --out.

Usage: python scripts/gated_bench.py [--sf DIR] [--out FILE]
              [--attempts N]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_GBPS = 4.0
MAX_STEAL_PCT = 2.0
SLEEP_UNHEALTHY = 120


def probe_gbps() -> float:
    best = 0.0
    for _ in range(2):
        b = np.empty(32_000_000, dtype=np.float64)
        t0 = time.monotonic()
        b[::512] = 1.0
        best = max(best, b.nbytes / (time.monotonic() - t0) / 1e9)
        del b
    return round(best, 2)


def steal_pct(window_s: float = 2.0) -> float:
    def rd():
        v = [int(x) for x in open("/proc/stat").readline().split()[1:]]
        return v[7], sum(v)

    s0, t0 = rd()
    time.sleep(window_s)
    s1, t1 = rd()
    return round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)


def healthy(tag: str) -> bool:
    g, s = probe_gbps(), steal_pct()
    print(f"[{tag}] probe={g} GB/s steal={s}%", flush=True)
    return g >= MIN_GBPS and s < MAX_STEAL_PCT


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/gated_bench_r4.json")
    ap.add_argument("--attempts", type=int, default=4)
    args = ap.parse_args()

    best: dict | None = None
    attempts_used = 0
    while attempts_used < args.attempts:
        if not healthy("pre"):
            time.sleep(SLEEP_UNHEALTHY)
            continue
        attempts_used += 1
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf)
        r = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"attempt {attempts_used}: no JSON (rc={r.returncode})\n"
                  + r.stderr[-2000:], flush=True)
            continue
        d = json.loads(line[-1])
        pg, pa = d.get("host_probe_gbps"), d.get("host_probe_gbps_after")
        sg, sa = d.get("host_steal_pct"), d.get("host_steal_pct_after")
        ok = all(
            x is not None for x in (pg, pa, sg, sa)
        ) and pg >= MIN_GBPS and pa >= MIN_GBPS and sg < MAX_STEAL_PCT \
            and sa < MAX_STEAL_PCT
        print(
            f"attempt {attempts_used}: total={d.get('value')}s "
            f"probes={pg}/{pa} steal={sg}/{sa} accepted={ok}", flush=True,
        )
        if ok and (best is None or d["value"] < best["value"]):
            best = d
            with open(args.out, "w") as f:
                json.dump(best, f)
        if best is not None:
            break  # one healthy-bracketed run is the artifact we need
    if best is None:
        print("NO accepted run", flush=True)
        return 1
    print("ACCEPTED: " + json.dumps(best), flush=True)
    return 0


if __name__ == "__main__":
    main()
