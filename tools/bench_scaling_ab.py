"""Interleaved A/B scaling measurement robust to host-weather drift.

The round-2/3 forensics (BENCH/BASELINE.md §1b) show that on this
shared host, BETWEEN-RUN steal-time weather can exceed the scaling
signal when each level is measured once in sequence. This harness
alternates the two levels A,B,A,B,... so slowly-varying weather hits
both levels roughly equally, then reports per-pair efficiencies and
their median — the standard interleaved-trials defense against a
drifting nuisance variable.

Usage:
  SCALING_EDGES_PATH=... python tools/bench_scaling_ab.py
Env: AB_LO (default 1), AB_HI (default 4), AB_REPS (default 3),
     SCALING_ITERS (default 5), SCALING_EXEC_CORES (default 1),
     AB_OUT (default BENCH/cluster_scaling_ab.json).
Steal per run is sampled from /proc/stat around each level run.
"""

from __future__ import annotations

import json
import os
import statistics
import time

from bench_scaling_cluster import REPO, run_level


def _jiffies():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:9]]
    return sum(vals), vals[7]  # total, steal


def main():
    master = os.environ.get("SCALING_MASTER", "spark://127.0.0.1:7077")
    path = os.environ.get("SCALING_EDGES_PATH", "/dev/shm/scaling_edges_31m")
    iters = int(os.environ.get("SCALING_ITERS", "5"))
    lo = int(os.environ.get("AB_LO", "1"))
    hi = int(os.environ.get("AB_HI", "4"))
    reps = int(os.environ.get("AB_REPS", "3"))
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)

    runs = []
    for r in range(reps):
        for level in (lo, hi):
            t0, s0 = _jiffies()
            res = run_level(level, iters, path, master)
            t1, s1 = _jiffies()
            res["rep"] = r
            res["steal_pct"] = round(100.0 * (s1 - s0) / max(1, t1 - t0), 1)
            runs.append(res)
            print(json.dumps(res), flush=True)

    pair_eff = []
    for r in range(reps):
        a = next(x for x in runs if x["rep"] == r and x["total_cores"] == lo)
        b = next(x for x in runs if x["rep"] == r and x["total_cores"] == hi)
        pair_eff.append(
            round(b["edges_per_sec"] / a["edges_per_sec"] / (hi / lo), 3)
        )
    summary = {
        "levels": [lo, hi],
        "executor_cores": int(os.environ.get("SCALING_EXEC_CORES", "1")),
        "iters_per_run": iters,
        "reps": reps,
        "runs": runs,
        "pair_efficiencies": pair_eff,
        "median_efficiency": round(statistics.median(pair_eff), 3),
    }
    print(json.dumps(summary))
    # AB_OUT may be a bare name, a BENCH-relative name, or absolute;
    # normalize so a prefixed name can't double the BENCH dir and lose
    # an hour of measurement to a failed open()
    out = os.environ.get("AB_OUT", "cluster_scaling_ab.json")
    out_path = (
        out if os.path.isabs(out)
        else os.path.join(REPO, "BENCH", os.path.basename(out))
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
