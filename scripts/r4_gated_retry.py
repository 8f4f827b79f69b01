"""Round-4 re-measurement loop for the suspect scaling levels.

Accept criteria per attempt (stricter than health_gated_scaling.py,
informed by today's discoveries):
  * fresh-page probe >= MIN_GBPS immediately BEFORE and AFTER the level,
  * CPU steal < MAX_STEAL_PCT before the level (round-4 discovery: the
    hypervisor steals 6-10% for tens of minutes while the memory probe
    reads healthy),
  * timed-run spread: max/min <= MAX_SPREAD for multi-run levels.
Keeps the BEST (fastest accepted) result per level; noise only ever
inflates, so best-of-accepted-attempts is the honest estimator.

Usage: python scripts/r4_gated_retry.py LEVEL [LEVEL...] --out STATE.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_GBPS = 4.0
MAX_STEAL_PCT = 2.0
MAX_SPREAD = 1.3
N_DOCS = "1600000"
SLEEP_UNHEALTHY = 180
MAX_HOURS = 4.0


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


def attempt(level: str) -> dict | None:
    r = subprocess.run(
        [sys.executable, "scripts/scaling_bench.py", N_DOCS,
         "--only", level, "--state", f"/tmp/sb_attempt_{level}.json"],
        cwd=REPO, capture_output=True, text=True,
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if r.returncode != 0 or not lines:
        print(f"  attempt failed rc={r.returncode}: {r.stderr[-300:]}",
              flush=True)
        return None
    return json.loads(lines[-1])[level]


def main() -> int:
    args = sys.argv[1:]
    out_path = "/tmp/sb_r4_final.json"
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    levels = args
    best: dict[str, dict] = {}
    if os.path.exists(out_path):
        best = json.load(open(out_path))
    t_start = time.monotonic()
    pending = [lv for lv in levels]
    while pending and time.monotonic() - t_start < MAX_HOURS * 3600:
        for level in list(pending):
            g = probe_gbps()
            s = steal_pct()
            if g < MIN_GBPS or s > MAX_STEAL_PCT:
                print(f"wait: probe {g} steal {s}", flush=True)
                time.sleep(SLEEP_UNHEALTHY)
                continue
            print(f"{level}: starting (probe {g}, steal {s})", flush=True)
            res = attempt(level)
            g2 = probe_gbps()
            s2 = steal_pct()
            if res is None:
                continue
            runs = res.get("timed_runs")
            spread_ok = (
                True if not runs else max(runs) / max(min(runs), 1e-9) <= MAX_SPREAD
            )
            healthy = g2 >= MIN_GBPS and s2 <= MAX_STEAL_PCT
            verdict = "ACCEPT" if (spread_ok and healthy) else "REJECT"
            print(
                f"{level}: {json.dumps(res)} after(probe {g2}, steal {s2}) "
                f"spread_ok={spread_ok} -> {verdict}",
                flush=True,
            )
            res["probe_before"], res["probe_after"] = g, g2
            res["steal_before"], res["steal_after"] = s, s2
            if verdict == "ACCEPT":
                prev = best.get(level)
                if prev is None or res["seconds"] < prev["seconds"]:
                    best[level] = res
                    json.dump(best, open(out_path, "w"), indent=1)
                # one accepted attempt is enough unless a later retry beats it
                pending.remove(level)
        time.sleep(5)
    print("FINAL " + json.dumps(best), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
