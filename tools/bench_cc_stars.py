"""Hash-min vs large-star/small-star CC at 31.5M edges.

Round counts are deterministic (weather-independent); wall times are
reported with /proc/stat steal stamps and the two algorithms run
back-to-back in the same session so they share weather. Label equality
is verified by an exact checksum (decimal sum of xxhash64(node,comp))
rather than a full join.

Usage: CC_EDGES_PATH=/dev/shm/scaling_edges_31m python tools/bench_cc_stars.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from webgraph_spark.session import get_spark
from webgraph_spark.algos.components import (
    connected_components,
    connected_components_stars,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _steal():
    with open("/proc/stat") as f:
        p = f.readline().split()
    v = [int(x) for x in p[1:9]]
    return sum(v), v[7]


def main():
    path = os.environ.get("CC_EDGES_PATH", "/dev/shm/scaling_edges_31m")
    os.makedirs("/dev/shm/sparktmp", exist_ok=True)
    spark = get_spark(
        "bench_cc_stars",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": "64",
            # /tmp on this VM is both slow and externally reaped mid-job
            # (BENCH/BASELINE.md §1a); shuffle must live on tmpfs
            "spark.local.dir": "/dev/shm/sparktmp",
        },
    )
    edges = spark.read.parquet(path).select("src", "dst")
    n_edges = edges.count()
    out = {"n_edges": n_edges, "runs": []}

    def checksum(labels):
        return str(
            labels.agg(
                F.sum(
                    F.xxhash64("node", "component").cast("decimal(38,0)")
                ).alias("s")
            ).collect()[0]["s"]
        )

    for name, fn in (
        ("stars", lambda: connected_components_stars(edges, max_iter=30)),
        ("hashmin", lambda: connected_components(edges, max_iter=100)),
    ):
        t0, s0 = _steal()
        w0 = time.time()
        res = fn()
        cs = checksum(res.labels)
        wall = round(time.time() - w0, 1)
        t1, s1 = _steal()
        run = {
            "algo": name,
            "rounds": res.iterations,
            "converged": res.converged,
            "wall_s": wall,
            "labels_checksum": cs,
            "steal_pct": round(100.0 * (s1 - s0) / max(1, t1 - t0), 1),
        }
        out["runs"].append(run)
        print(json.dumps(run), flush=True)

    out["labels_identical"] = (
        out["runs"][0]["labels_checksum"] == out["runs"][1]["labels_checksum"]
    )
    print(json.dumps({"labels_identical": out["labels_identical"]}))
    with open(os.path.join(REPO, "BENCH", "cc_stars_31m.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
