#!/usr/bin/env python
"""N vs 4N scaling evidence (north_rule): run the same bench job at
local[N] and local[4N] on the same input and report throughput at both
plus the scaling efficiency.

Efficiency = (throughput_4N / throughput_N) / 4 — 1.0 is perfect linear
scaling, ≥ 0.8 is the BASELINE.json bar.  Results are appended to
BENCH_SCALING.json and summarized for BASELINE.md.

This sandbox shares its host with other tenants (observed wall-time
variance ±2×, occasionally worse), so each parallelism level can run
multiple trials (SCALING_TRIALS, default 1) and the best throughput per
level is compared — best-of-N approximates the interference-free
machine both levels would see on a dedicated cluster.

Usage: python scripts/run_scaling.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir)
    # fair comparison defaults: identical segment geometry at every
    # level (the builder otherwise sizes segments off the core count)
    # and build-only timing (the scaling metric is build throughput)
    env.setdefault("BENCH_SEG_SIZE", "16384")
    env.setdefault("BENCH_ONLY_BUILD", "1")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, check=True, cwd=REPO)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    trials = int(os.environ.get("SCALING_TRIALS", "1"))
    results = {}
    all_trials: dict[int, list[float]] = {}
    for cpus in (n, 4 * n):
        best = None
        all_trials[cpus] = []
        for t in range(trials):
            r = run_at(cpus, sf_dir)
            all_trials[cpus].append(r["value"])
            print(f"local[{cpus}] trial {t}: {r['value']} turns/sec "
                  f"(build {r['queries']['index_build']}s)", flush=True)
            if best is None or r["value"] > best["value"]:
                best = r
        results[cpus] = best

    tn, t4n = results[n]["value"], results[4 * n]["value"]
    eff = (t4n / tn) / 4.0
    summary = {
        "n_cores": n,
        "throughput_n": tn,
        "throughput_4n": t4n,
        "speedup": round(t4n / tn, 3),
        "efficiency": round(eff, 3),
        "trials_per_level": trials,
        "all_trials": all_trials,
        "sf_dir": sf_dir,
        "queries_n": results[n]["queries"],
        "queries_4n": results[4 * n]["queries"],
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
