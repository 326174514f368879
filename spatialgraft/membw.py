"""Memory-bandwidth probing for benchmark records.

The third contention channel on this co-tenant box, and the only one
neither defense can see: ``/proc/stat`` steal ticks account CPU the
hypervisor took, and the busy-loop calibration measures ALU scaling —
but a co-tenant STREAMING THE MEMORY BUS throttles bus-bound work
while both read clean.  The round-5 decomposition pinned the residual
8-core kNN gap on exactly this channel (the slim-cache build is 57%
of the 4N wall and bus-bound; the bare-sort control scaled 0.23-0.31
on a quiet box), so a window where 2-core walls reproduce, steal
reads ~2%, the ALU probe reads ~0.9, and ONLY the wide bus-bound op
is slow is the bus-thief signature — seen twice in round 6
(bench_records/r6_gate_2core_*.jsonl, 4N kNN 2.7x r5 while 4N PIP
beat every r5 reading).

This probe measures the channel directly: P worker processes each
stream a triad (c = a + s*b) over arrays far larger than LLC and the
record keeps aggregate GB/s at a narrow and a wide process count.  On
a quiet bus the wide reading is flat-to-higher than the narrow one
(the bus saturates); a bus thief drags the wide reading down first.
Values are only comparable on one box — the point is the DELTA from
the clean-window reference banked next to the gate records.

CLI: ``python -m spatialgraft.membw [P ...]`` (default 2 8) prints one
JSON line ``{"membw_p2_gbs": ..., "membw_p8_gbs": ...}``.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

# per-worker array length: 8M float64 = 64 MiB per array, 3 arrays =
# 192 MiB per worker — far beyond any LLC, small enough that 8 workers
# fit a 128 GiB box without touching reclaim
_N = 8_000_000
_ITERS = 4


def _triad(_: int) -> tuple[float, float]:
    """One worker: warm (allocate + first-touch + one untimed pass),
    then _ITERS timed triad passes.  Returns (bytes_moved, seconds)."""
    import numpy as np

    a = np.ones(_N)
    b = np.full(_N, 2.0)
    c = np.zeros(_N)
    np.multiply(b, 1.1, out=c)
    np.add(c, a, out=c)  # untimed warm pass (faults the pages in)
    t0 = time.perf_counter()
    for _i in range(_ITERS):
        np.multiply(b, 1.1, out=c)
        np.add(c, a, out=c)
    dt = time.perf_counter() - t0
    # traffic per pass: multiply reads b + writes c, add reads a,c +
    # writes c -> ~5 array transfers of 8B*_N (write-allocate ignored:
    # the number is a comparator, not a datasheet figure)
    return 5.0 * 8 * _N * _ITERS, dt


def probe(procs: int) -> float:
    """Aggregate triad GB/s with `procs` concurrent workers.

    spawn, not fork (ADVICE r6): bench.py calls this inside the live
    PySpark driver process, and forking a JVM-attached process with py4j
    gateway threads/sockets held can deadlock on unlucky lock state.
    Spawned children import nothing beyond numpy; the ~0.5 s start cost
    sits outside every timed region by design (the probe brackets
    measurements, it never runs inside them)."""
    ctx = mp.get_context("spawn")
    with ctx.Pool(procs) as pool:
        res = pool.map(_triad, range(procs))
    total_bytes = sum(r[0] for r in res)
    wall = max(r[1] for r in res)
    return round(total_bytes / wall / 1e9, 2)


def main(argv: list[str]) -> None:
    counts = [int(x) for x in argv] or [2, 8]
    print(json.dumps({f"membw_p{p}_gbs": probe(p) for p in counts}))


if __name__ == "__main__":
    main(sys.argv[1:])
