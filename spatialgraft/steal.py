"""Hypervisor-steal tracing for benchmark records.

This box's co-tenant contention is invisible to guest load averages
(the thief is outside the VM), which forced rounds 2-6 to bracket
every measurement with busy-loop CPU-scaling probes — point-in-time
readings that cannot underwrite a multi-minute window (the r6 watcher
caught a 0.963 probe collapsing to a 61 s suite mid-run).  But the
kernel DOES account the hypervisor's involuntary preemption:
``/proc/stat`` field 8 (steal) counts ticks the vCPUs were runnable
but the host ran someone else.  Measured here: ~2-3% steal in a
probe-clean window, spiking during the collapses the probes miss.

Reading two lines of ``/proc/stat`` costs nothing and needs no CPU,
so every measured region can carry its OWN contamination evidence:

    with StealTrace() as tr: run_query()
    tr.summary()  # {"steal_pct": ..., "busy_pct": ..., samples...}

``steal_pct`` is steal ticks / (wall x n_cpus x HZ) over the region —
the fraction of the machine the hypervisor took while we measured.
A daemon thread samples once a second so the summary also reports the
worst 1-second spike (bursty steal integrates invisibly into a
region-level mean; the max exposes it).
"""

from __future__ import annotations

import os
import threading
import time

_NCPU = os.cpu_count() or 1
_HZ = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def read_ticks() -> tuple[int, int, float]:
    """(steal_ticks, busy_ticks, wall_now) from /proc/stat's cpu line.

    busy = user+nice+system+irq+softirq: what the GUEST ran — lets a
    record distinguish "we were stolen from" (steal high) from "another
    guest process competed" (busy high while the bench was idle)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(v) for v in parts[1:]]
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, busy, time.time()


def _pct(dticks: int, dwall: float) -> float:
    """Ticks over a wall interval -> % of the whole machine."""
    if dwall <= 0:
        return 0.0
    return round(100.0 * dticks / (dwall * _NCPU * _HZ), 2)


class StealTrace:
    """Samples /proc/stat once a second over a measured region."""

    def __init__(self, interval: float = 1.0):
        self.interval = interval
        self._samples: list[tuple[float, int, int]] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self) -> None:
        while not self._stop.wait(self.interval):
            s, b, w = read_ticks()
            self._samples.append((w, s, b))

    def __enter__(self) -> "StealTrace":
        s, b, w = read_ticks()
        self._samples = [(w, s, b)]
        self._stop.clear()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.interval)
        s, b, w = read_ticks()
        self._samples.append((w, s, b))

    def summary(self) -> dict:
        """Region totals + the worst per-sample steal spike."""
        first, last = self._samples[0], self._samples[-1]
        dwall = last[0] - first[0]
        spikes = [
            _pct(b[1] - a[1], b[0] - a[0])
            for a, b in zip(self._samples, self._samples[1:])
            if b[0] > a[0]
        ]
        return {
            "steal_pct": _pct(last[1] - first[1], dwall),
            "busy_pct": _pct(last[2] - first[2], dwall),
            "steal_max_1s_pct": max(spikes) if spikes else 0.0,
            "wall_sec": round(dwall, 2),
        }
