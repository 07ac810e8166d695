"""Scaling evidence on a REAL multi-executor cluster (standalone, localhost).

The north rule's criterion is throughput scaling from N to 4N
*executors*. A single local[k] JVM conflates thread scaling with GC and
memory-bandwidth contention, so this harness starts from a Spark
standalone cluster (master + one 32-core worker on localhost — started
out-of-band, see BENCH/BASELINE.md) and submits the SAME PageRank job
with --total-executor-cores 4 (1 executor x 4 cores) and 16
(4 executors x 4 cores), reading the same stored parquet edge table.

Throughput is measured over the steady-state iteration loop (5 fixed
synchronous iterations; every iteration does identical work) — setup
(ingest/persist/degree join) is a one-time cost reported separately.

Usage: python tools/bench_scaling_cluster.py  (assumes master at
spark://127.0.0.1:7077 and /tmp/scaling_edges parquet present).
"""

from __future__ import annotations

import json
import os
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
total_cores = int(sys.argv[1]); iters = int(sys.argv[2]); path = sys.argv[3]
import os
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
# FIXED partition count at every level: both cluster sizes execute the
# identical 64-task decomposition (what a real job does when executors
# scale against the same data), and the per-partition shuffled-hash-join
# build stays ~1M rows regardless of core count
parts = int(os.environ.get("SCALING_PARTITIONS", "64"))
builder = (SparkSession.builder.appName(f"scale{{total_cores}}")
    .config("spark.sql.shuffle.partitions", str(parts)))
if os.environ.get("SCALING_EVENTLOG"):
    os.makedirs("/tmp/spark-events", exist_ok=True)
    builder = (builder.config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", "/tmp/spark-events"))
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from webgraph_spark.algos.pagerank import pagerank, pagerank_fused, _prepare
from webgraph_spark.plans.iterate import iteration_confs

chain = int(os.environ.get("SCALING_CHAIN", "5"))
mode = os.environ.get("SCALING_MODE", "fused")

# one-time setup OUTSIDE the timed loop: read, degree-join, partition,
# persist — the stored-graph build that a real deployment does once.
# The timed section is the steady-state iteration loop alone (identical
# work per iteration), matching the north rule's THROUGHPUT criterion.
t_setup = time.time()
edges = spark.read.parquet(path)
n_edges = edges.count()
ew, nodes, P = _prepare(edges, parts)
ew.count()
n = nodes.count()
prep = (ew, nodes, P, n)
pr = (lambda it: pagerank_fused(edges, fixed_iterations=it, chain=chain, prepared=prep)) if mode == "fused" \
    else (lambda it: pagerank(edges, fixed_iterations=it))
# one throwaway chain to JIT-warm executors
warm = pr(chain if mode == "fused" else 1)
warm.ranks.count()
t_setup = time.time() - t_setup

t0 = time.time()
res = pr(iters)
res.ranks.count()
t_loop = time.time() - t0
iters = res.iterations  # chain rounding may execute a few more
print(json.dumps({{
    "total_cores": total_cores, "n_edges": n_edges, "iters": iters,
    "mode": mode, "chain": chain,
    "setup_sec": round(t_setup, 1), "loop_sec": round(t_loop, 1),
    "per_iter": round(t_loop / iters, 2),
    "edges_per_sec": round(n_edges * iters / t_loop, 1)}}))
spark.stop()
"""


def run_level(total_cores: int, iters: int, path: str, master: str) -> dict:
    script = "/tmp/cluster_scaling_runner.py"
    with open(script, "w") as f:
        f.write(RUNNER.format(repo=REPO))
    zip_path = "/tmp/webgraph_spark_pkg.zip"
    subprocess.run(
        ["zip", "-qr", zip_path, "webgraph_spark"], cwd=REPO, check=True
    )
    exec_cores = os.environ.get("SCALING_EXEC_CORES", "4")
    # worker memory bounds executor count: N 1-core executors need
    # N * executor-memory <= worker memory, or the cluster silently
    # schedules fewer executors than the level claims
    exec_mem = os.environ.get("SCALING_EXEC_MEM", "20g")
    out = subprocess.run(
        [
            "spark-submit", "--master", master,
            "--executor-cores", exec_cores, "--executor-memory", exec_mem,
            "--driver-memory", "8g",
            "--total-executor-cores", str(total_cores),
            "--conf", "spark.local.dir=/dev/shm/sparktmp",
            "--py-files", zip_path,
            script, str(total_cores), str(iters), path,
        ],
        capture_output=True, text=True, timeout=7200,
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"level {total_cores} failed: {out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main():
    master = os.environ.get("SCALING_MASTER", "spark://127.0.0.1:7077")
    path = os.environ.get("SCALING_EDGES_PATH", "/tmp/scaling_edges")
    iters = int(os.environ.get("SCALING_ITERS", "5"))
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    levels = [
        int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(",")
    ]
    exec_cores = os.environ.get("SCALING_EXEC_CORES", "4")
    # run largest level first (validates cluster capacity early), report
    # in ascending order; with >2 levels the artifact carries the whole
    # curve plus per-step efficiencies between consecutive levels
    results = {}
    for c in sorted(set(levels), reverse=True):
        results[c] = run_level(c, iters, path, master)
        print(json.dumps(results[c]), flush=True)
    asc = sorted(results)
    steps = {}
    for lo_c, hi_c in zip(asc, asc[1:]):
        steps[f"eff_{lo_c}to{hi_c}_cores"] = round(
            results[hi_c]["edges_per_sec"]
            / results[lo_c]["edges_per_sec"]
            / (hi_c / lo_c),
            3,
        )
    lo_c, hi_c = asc[0], asc[-1]
    eff = round(
        results[hi_c]["edges_per_sec"] / results[lo_c]["edges_per_sec"]
        / (hi_c / lo_c),
        3,
    )
    # self-describing artifact: key + levels derived from the actual run,
    # default output name too (so reruns at other levels never overwrite
    # prior evidence under a misleading name)
    summary = {
        "levels": {str(c): results[c] for c in asc},
        "levels_total_cores": asc,
        "executor_cores": int(exec_cores),
        "per_step_efficiency": steps,
        f"scaling_efficiency_{lo_c}to{hi_c}_cores": eff,
    }
    print(json.dumps(summary))
    out_name = os.environ.get(
        "SCALING_OUT",
        f"cluster_scaling_{'_'.join(str(c) for c in asc)}c_x{exec_cores}.json",
    )
    with open(os.path.join(REPO, "BENCH", out_name), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
