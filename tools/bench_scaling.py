"""Scaling-efficiency evidence: same job at two parallelism levels.

BASELINE.json north_rule requires >= 0.8 throughput scaling efficiency
from N to 4N executors; in this sandbox (driver instruction) that is
evidenced as local[8] vs local[32] on the SAME input. Each level runs in
a fresh spark-submit subprocess (fresh JVM, no warm caches shared).

Writes BENCH/BASELINE.md and prints a JSON summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
cpus = int(sys.argv[1]); n_convs = int(sys.argv[2])
from webgraph_spark.session import get_spark
from bench import build_transcript_graph
from webgraph_spark.algos.pagerank import pagerank
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")
edges = build_transcript_graph(spark, n_convs).persist()
n_edges = edges.count()
t0 = time.time()
res = pagerank(edges, tol=1e-6, max_iter=100)
res.ranks.count()
t = time.time() - t0
print(json.dumps({{"cpus": cpus, "n_edges": n_edges, "sec": round(t, 3),
                   "iters": res.iterations,
                   "edges_per_sec": round(n_edges * res.iterations / t, 1)}}))
spark.stop()
"""


def run_level(cpus: int, n_convs: int) -> dict:
    script = os.path.join("/tmp", f"scaling_runner_{cpus}.py")
    with open(script, "w") as f:
        f.write(RUNNER.format(repo=REPO))
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, script, str(cpus), str(n_convs)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_convs = int(os.environ.get("SCALING_N_CONVS", "30000"))
    lo, hi = 8, 32
    r_lo = run_level(lo, n_convs)
    r_hi = run_level(hi, n_convs)
    speedup = r_hi["edges_per_sec"] / r_lo["edges_per_sec"]
    efficiency = speedup / (hi / lo)
    summary = {
        "n_convs": n_convs,
        "low": r_lo,
        "high": r_hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "meets_target": efficiency >= 0.8,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH — scaling evidence (north_rule: efficiency >= 0.8 from N to 4N)

Same input (seeded transcript graph, n_convs={n_convs},
{r_lo['n_edges']} edges), PageRank to L-inf < 1e-6, fresh JVM per level.

| parallelism | wall sec | iterations | edges/sec (x iters) |
|---|---|---|---|
| local[{lo}] | {r_lo['sec']} | {r_lo['iters']} | {r_lo['edges_per_sec']} |
| local[{hi}] | {r_hi['sec']} | {r_hi['iters']} | {r_hi['edges_per_sec']} |

- speedup {lo}->{hi} cores: **{summary['speedup']}x** (ideal {hi//lo}x)
- scaling efficiency: **{summary['scaling_efficiency']}** (target >= 0.8)
- meets target: **{summary['meets_target']}**

Notes: per-iteration work is one co-partitioned rank-edge join + one
groupBy(dst) shuffle + two scalar aggregates; AQE on; shuffle
partitions = max(cores, 8). On a real cluster N->4N executors maps to
the same plan with executor-count-scaled shuffle partitions.
"""
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
