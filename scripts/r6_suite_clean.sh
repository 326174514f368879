#!/bin/bash
# Round-6 clean-window sf0.1 suite record (VERDICT r5 item 6).  Loops:
# read the ambient hypervisor steal over 30 s (/proc/stat field 8 —
# the r6 tick-accounting discovery, spatialgraft/steal.py); when it is
# quiet (< MAXSTEAL %) AND the busy-loop calibration passes AND no
# other Spark JVM is running (the r5 protocol lesson: one Spark JVM at
# a time, ever), run the headline suite once and append the record
# line + window readings to $OUT.  bench.py now also stamps per-rep
# steal_pct inside the line, so a window that collapses mid-suite
# self-labels instead of needing the after-probe to catch it.
set -u
OUT=${OUT:-bench_records/r6_sf01_suite_clean.jsonl}
MINCAL=${MINCAL:-0.90}
MAXSTEAL=${MAXSTEAL:-0.7}
MINBW=${MINBW:-85}
MAXRUNS=${MAXRUNS:-2}
BUDGET=${BUDGET:-7200}
cd /root/repo
mkdir -p bench_records

steal30() {
  python - <<'PY'
import os, time
def t():
    with open("/proc/stat") as f: p = f.readline().split()
    return int(p[8]), time.time()
s1, w1 = t(); time.sleep(30); s2, w2 = t()
print(f"{100.0*(s2-s1)/((w2-w1)*(os.cpu_count() or 1)*os.sysconf('SC_CLK_TCK')):.2f}")
PY
}

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
  st=$(steal30)
  if python -c "import sys; sys.exit(0 if float('$st') <= $MAXSTEAL else 1)"; then
    cal=$(probe)
    # bandwidth floor (the r6 adjudication: the bus thief passes both
    # the steal and ALU gates — gate_pairs.sh MINBW, same threshold)
    bw=$(python -m spatialgraft.membw 8 | python -c "import json,sys; print(json.load(sys.stdin)['membw_p8_gbs'])")
    if python -c "import sys; sys.exit(0 if (float('$cal') >= $MINCAL and float('$bw') >= $MINBW) else 1)"; then
      line=$(timeout 900 python bench.py 2>/tmp/r6_suite.err | tail -1)
      st_after=$(steal30)
      bw_after=$(python -m spatialgraft.membw 8 | python -c "import json,sys; print(json.load(sys.stdin)['membw_p8_gbs'])")
      if [ -n "$line" ]; then
        echo "{\"steal30_before\": $st, \"cal_before\": $cal, \"membw_p8_before\": $bw, \"steal30_after\": $st_after, \"membw_p8_after\": $bw_after, ${line#\{}" >> $OUT
        runs=$((runs+1))
        echo "recorded run $runs (steal $st -> $st_after, cal $cal, bw $bw -> $bw_after)"
      fi
    else
      echo "steal quiet ($st) but probe dirty (cal=$cal, bw=$bw), waiting"
      sleep 60
    fi
  else
    echo "ambient steal $st% > $MAXSTEAL%, waiting"
    sleep 60
  fi
done
echo DONE
