"""Attribute hyperball_nf16's wall time: register-merge CPU vs shuffle.

Round-4 verdict item 7: hyperball_nf16 is the biggest single bench item
(47 s at sf0.1) — before considering a packed-long JVM ``max``
aggregate, measure WHERE the time goes. Runs the exact bench-config
HyperBall (log2m=5, max_t=16) on the bench transcript graph with the
Spark event log on, then sums task metrics across all stages:

- executor CPU time (the register-merge arithmetic + codegen eval)
- shuffle fetch wait + shuffle write time (the data-motion cost)
- GC, deserialization, and scheduler/driver gaps (the rest)

Prints one JSON line; the paragraph in BENCH/BASELINE.md quotes it.

Usage: python tools/profile_hyperball.py [n_convs]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    evdir = tempfile.mkdtemp(prefix="hb_eventlog_")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("profile_hyperball")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .config("spark.eventLog.compress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import build_transcript_graph
    from webgraph_spark.algos.hyperball import hyperball

    edges = build_transcript_graph(spark, n_convs).persist()
    n_edges = edges.count()
    t0 = time.time()
    hb = hyperball(edges, log2m=5, max_t=16, seed=31)
    wall = time.time() - t0
    spark.stop()  # flush the event log

    # Spark 4 writes a rolling event-log DIRECTORY (eventlog_v2_*)
    logs = sorted(
        (p for p in glob.glob(os.path.join(evdir, "**", "*"),
                              recursive=True)
         if os.path.isfile(p) and "appstatus" not in p),
        key=os.path.getmtime)
    cpu_ns = run_ms = gc_ms = fetch_ms = swrite_ns = deser_ms = 0
    sread_b = swrite_b = n_tasks = 0
    def _events():
        for p in logs:
            with open(p) as f:
                for line in f:
                    try:
                        yield json.loads(line)
                    except json.JSONDecodeError:
                        continue

    if True:
        for ev in _events():
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            tm = ev.get("Task Metrics") or {}
            sr = tm.get("Shuffle Read Metrics") or {}
            sw = tm.get("Shuffle Write Metrics") or {}
            n_tasks += 1
            cpu_ns += tm.get("Executor CPU Time", 0)
            run_ms += tm.get("Executor Run Time", 0)
            gc_ms += tm.get("JVM GC Time", 0)
            deser_ms += tm.get("Executor Deserialize Time", 0)
            fetch_ms += sr.get("Fetch Wait Time", 0)
            swrite_ns += sw.get("Shuffle Write Time", 0)
            sread_b += sr.get("Remote Bytes Read", 0) + sr.get(
                "Local Bytes Read", 0)
            swrite_b += sw.get("Shuffle Bytes Written", 0)

    cpu_s = cpu_ns / 1e9
    run_s = run_ms / 1e3
    out = {
        "n_edges": n_edges,
        "wall_sec": round(wall, 2),
        "rounds": hb.iterations,
        "n_tasks": n_tasks,
        "executor_run_core_sec": round(run_s, 1),
        "executor_cpu_core_sec": round(cpu_s, 1),
        "gc_core_sec": round(gc_ms / 1e3, 1),
        "deser_core_sec": round(deser_ms / 1e3, 1),
        "shuffle_fetch_wait_core_sec": round(fetch_ms / 1e3, 1),
        "shuffle_write_core_sec": round(swrite_ns / 1e9, 1),
        "shuffle_read_mb": round(sread_b / 1e6, 1),
        "shuffle_write_mb": round(swrite_b / 1e6, 1),
        # run time not accounted by CPU = I/O + fetch + spill + stalls
        "run_minus_cpu_core_sec": round(run_s - cpu_s, 1),
        "cpu_share_of_run": round(cpu_s / run_s, 3) if run_s else None,
        # wall not covered by (run/32) = scheduler + driver gaps
        "driver_gap_sec": round(wall - run_s / 32, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
