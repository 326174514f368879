#!/bin/bash
# Round-6 clean-window sf0.1 suite record (VERDICT r5 item 6).  Loops:
# probe the co-tenant CPU-scaling calibration; when the window is clean
# (cal >= MINCAL) AND no other Spark JVM is running (the r5 protocol
# lesson: a watcher that fired mid-gate contaminated a grid A/B — one
# Spark JVM at a time, ever), run the headline suite once and append
# the record line + calibration to $OUT.  Stops after MAXRUNS in-window
# records or BUDGET seconds.
set -u
OUT=${OUT:-bench_records/r6_sf01_suite_clean.jsonl}
MINCAL=${MINCAL:-0.93}
MAXRUNS=${MAXRUNS:-2}
BUDGET=${BUDGET:-7200}
cd /root/repo
mkdir -p bench_records

probe() {
  python - <<'PY'
import multiprocessing as mp, time
def burn(n):
    x=0
    for i in range(n): x+=i*i
    return x
def run(p,n=8_000_000):
    t0=time.perf_counter()
    with mp.Pool(p) as pool: pool.map(burn,[n]*p*4)
    return time.perf_counter()-t0
tl=run(8); th=run(32)
print(f"{(32*4/th)/(8*4/tl)/4:.3f}")
PY
}

runs=0
t0=$(date +%s)
while [ $runs -lt $MAXRUNS ] && [ $(( $(date +%s) - t0 )) -lt $BUDGET ]; do
  if pgrep -f "org.apache.spark" > /dev/null || pgrep -f "scaling-one" > /dev/null; then
    sleep 120; continue
  fi
  cal=$(probe)
  if python -c "import sys; sys.exit(0 if float('$cal') >= $MINCAL else 1)"; then
    line=$(timeout 900 python bench.py 2>/tmp/r6_suite.err | tail -1)
    cal_after=$(probe)
    if [ -n "$line" ]; then
      echo "{\"cal_before\": $cal, \"cal_after\": $cal_after, ${line#\{}" >> $OUT
      runs=$((runs+1))
      echo "recorded run $runs (cal $cal -> $cal_after)"
    fi
  else
    echo "dirty window (cal=$cal), waiting"
    sleep 90
  fi
done
echo DONE
