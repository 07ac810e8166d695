"""Summarize a Spark event log: per-stage wall/executor time, shuffle
volumes, straggler ratios, and inter-stage driver gaps.

Usage: python tools/analyze_eventlog.py /tmp/spark-events/<app-id>
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main(path: str):
    stages = {}
    tasks = defaultdict(list)
    app_start = app_end = None
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif e == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:60],
                    "n_tasks": si["Number of Tasks"],
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                }
            elif e == "SparkListenerTaskEnd":
                ti = ev["Task Info"]
                tm = ev.get("Task Metrics") or {}
                sr = (tm.get("Shuffle Read Metrics") or {})
                sw = (tm.get("Shuffle Write Metrics") or {})
                tasks[ev["Stage ID"]].append(
                    {
                        "dur": ti["Finish Time"] - ti["Launch Time"],
                        "run": tm.get("Executor Run Time", 0),
                        "gc": tm.get("JVM GC Time", 0),
                        "deser": tm.get("Executor Deserialize Time", 0),
                        "sread": sr.get("Total Records Read", 0),
                        "sread_b": sr.get("Remote Bytes Read", 0)
                        + sr.get("Local Bytes Read", 0),
                        "swrite_b": sw.get("Shuffle Bytes Written", 0),
                        "fetchwait": sr.get("Fetch Wait Time", 0),
                        "swritetime": sw.get("Shuffle Write Time", 0) / 1e6,
                    }
                )

    order = sorted(stages)
    total_wall = 0
    prev_end = None
    gap_total = 0
    print(f"{'stage':>5} {'wall_s':>7} {'gap_s':>6} {'exec_s':>8} {'gc_s':>6} "
          f"{'max/avg':>7} {'sh_read':>9} {'sh_write':>9} name")
    for sid in order:
        st = stages[sid]
        ts = tasks.get(sid, [])
        if st["submit"] is None or st["complete"] is None:
            continue
        wall = (st["complete"] - st["submit"]) / 1000
        gap = (st["submit"] - prev_end) / 1000 if prev_end else 0
        gap_total += max(gap, 0)
        prev_end = st["complete"]
        total_wall += wall
        run = sum(t["run"] for t in ts) / 1000
        gc = sum(t["gc"] for t in ts) / 1000
        durs = [t["dur"] for t in ts] or [0]
        skew = max(durs) / (sum(durs) / len(durs)) if sum(durs) else 0
        srb = sum(t["sread_b"] for t in ts) / 1e9
        swb = sum(t["swrite_b"] for t in ts) / 1e9
        print(
            f"{sid:>5} {wall:>7.1f} {gap:>6.1f} {run:>8.1f} {gc:>6.1f} "
            f"{skew:>7.2f} {srb:>8.2f}G {swb:>8.2f}G {st['name']}"
        )
    if app_start and app_end:
        print(f"app wall: {(app_end - app_start) / 1000:.1f}s  "
              f"stage wall sum: {total_wall:.1f}s  inter-stage gaps: {gap_total:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1])
