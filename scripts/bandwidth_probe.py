"""Host scaling-envelope probe: pure-CPU vs memory-streaming parallel
efficiency on this machine.

The official scaling pair (local[1] → local[4], pinned CPU sets) can
only show the efficiency the HOST delivers.  Two 3-second
microbenchmarks measure that envelope directly:

* ``cpu``    — a register-only busy loop (no memory traffic): what the
  cores deliver when nothing is shared.
* ``stream`` — summing a 240 MB array per process (far beyond any L3
  share): what the cores deliver when the memory controller is the
  shared resource.

A multi-executor cluster has a memory controller PER NODE, so the
stream row is a single-box artifact, not an engine property — but on
this box it CAPS every shuffle/cache/Arrow-heavy stage.  Report both
so a scaling number can be read against the right ceiling.

Usage: python scripts/bandwidth_probe.py [nprocs ...]  (default 1 2 8)
Prints one JSON line per workload.
"""

import json
import multiprocessing as mp
import os
import sys
import time


def _stream(cpu: int, dur: float, q) -> None:
    import numpy as np

    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    a = np.random.rand(30_000_000)  # ~240 MB
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < dur:
        a.sum()
        n += 1
    q.put(n)


def _cpuonly(cpu: int, dur: float, q) -> None:
    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    t0 = time.perf_counter()
    k = 0
    x = 1.0001
    while time.perf_counter() - t0 < dur:
        for _ in range(20000):
            x = x * 1.0000001 % 7.3
        k += 1
    q.put(k)


def main() -> None:
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 8]
    # the scaling_vs_1proc key promises a 1-process baseline — always
    # measure it, even when the caller only asks for higher levels
    # (normalizing against levels[0] would silently rebase the
    # "per-core efficiency" to whatever contention that level already
    # suffers, overstating the envelope)
    if 1 not in levels:
        levels = [1] + levels
    ctx = mp.get_context("fork")
    for name, fn in (("cpu", _cpuonly), ("stream", _stream)):
        totals: dict[int, int] = {}
        for nproc in levels:
            best = 0
            for _ in range(2):  # best-of-2: a descheduled round would
                # otherwise understate the level (co-tenant noise)
                q = ctx.Queue()
                ps = [
                    ctx.Process(target=fn, args=(c, 3.0, q))
                    for c in range(nproc)
                ]
                for p in ps:
                    p.start()
                for p in ps:
                    p.join()
                best = max(best, sum(q.get() for _ in ps))
            totals[nproc] = best
        base = totals[1]
        out = {
            "workload": name,
            "throughput": totals,
            "scaling_vs_1proc": {
                n: round(t / (base * n), 3) for n, t in totals.items()
            },
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
