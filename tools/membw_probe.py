"""Host memory-bandwidth scaling probe (STREAM-triad-like, numpy).

Measures aggregate bandwidth of the SAME per-process working set run by
1 and by N concurrent processes. On a healthy dedicated box, N
processes on N cores deliver ~min(N, memory-channel limit)× the
single-process aggregate; on a bandwidth-starved shared host the
aggregate stays flat (or drops), which is exactly the regime where a
multi-executor Spark job cannot scale NO MATTER what the dataflow does.
Run next to scaling measurements to separate "engine doesn't scale"
from "host memory system is saturated by co-tenants".

Usage: python tools/membw_probe.py [nprocs ...]   (default: 1 4)
Prints one JSON line per level: aggregate GB/s over a ~1 GiB triad.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

N = 64_000_000  # floats -> 512 MiB/array, ~1.5 GiB touched per pass


def _triad(q):
    import numpy as np

    a = np.ones(N)
    b = np.full(N, 2.0)
    c = np.zeros(N)
    # warm-up pass faults the pages in
    np.multiply(b, 3.0, out=c)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        np.multiply(b, 1.000001, out=c)
        c += a
    dt = time.time() - t0
    # triad moves 3 arrays * 8 bytes * N per rep (read b, read a+c, write c)
    q.put(reps * 4 * 8 * N / dt / 1e9)


def run_level(nproc: int) -> dict:
    q = mp.Queue()
    procs = [mp.Process(target=_triad, args=(q,)) for _ in range(nproc)]
    t0 = time.time()
    for p in procs:
        p.start()
    per = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return {
        "nproc": nproc,
        "per_proc_gbps": [round(x, 2) for x in per],
        "aggregate_gbps": round(sum(per), 2),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    levels = [int(x) for x in sys.argv[1:]] or [1, 4]
    out = []
    for n in levels:
        r = run_level(n)
        out.append(r)
        print(json.dumps(r), flush=True)
    if len(out) >= 2:
        base = out[0]
        last = out[-1]
        ratio = last["aggregate_gbps"] / base["aggregate_gbps"]
        print(json.dumps({
            "aggregate_scaling": round(ratio, 2),
            "ideal": last["nproc"] / base["nproc"],
        }))


if __name__ == "__main__":
    main()
