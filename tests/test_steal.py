"""spatialgraft.steal: the /proc/stat hypervisor-steal trace that every
bench record line carries (bench.py suite reps and --scaling-one op
walls)."""

import time

from spatialgraft.steal import StealTrace, read_ticks


def test_read_ticks_monotonic():
    s1, b1, w1 = read_ticks()
    # burn a little guest CPU so busy must advance
    t0 = time.perf_counter()
    x = 0
    while time.perf_counter() - t0 < 0.3:
        x += 1
    s2, b2, w2 = read_ticks()
    assert s2 >= s1 and b2 > b1 and w2 > w1


def test_trace_summary_shape_and_bounds():
    with StealTrace(interval=0.1) as tr:
        time.sleep(0.35)
    s = tr.summary()
    assert set(s) == {"steal_pct", "busy_pct", "steal_max_1s_pct",
                      "wall_sec"}
    assert 0 <= s["steal_pct"] <= 100
    assert 0 <= s["busy_pct"] <= 100 * 2  # irq accounting slack
    assert s["wall_sec"] >= 0.3
    # the sampler thread actually sampled (enter + >=2 ticks + exit)
    assert len(tr._samples) >= 3


def test_trace_idle_region_reads_low_busy():
    # an idle sleep region: the GUEST busy fraction attributable to this
    # process is ~0; ambient busy can exist but must stay a fraction
    with StealTrace(interval=0.1) as tr:
        time.sleep(0.3)
    s = tr.summary()
    # can't assert ambient quiet on a shared box; only that the math
    # produced a sane percentage, not tick totals
    assert s["busy_pct"] < 150
