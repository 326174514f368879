#!/bin/bash
# Runs N/4N scaling pairs, recording ambient CPU-scaling calibration
# with each pair. Appends JSON lines to $OUT.
#
# Co-tenant steal on this box is invisible to guest load yet throttles
# wide runs (a busy-loop calibration from 8->32 procs swings 0.68-0.97
# by the minute).  Defenses:
#   - each pair WAITS for a clean window (quick 32-proc probe >= MINCAL,
#     re-checked every 60 s up to WAITMAX s);
#   - ORDER controls which level runs first.  4nfirst puts the short
#     wide level inside the probed window; nfirst brackets the
#     protocol-bias question (ADVICE r2: record both orders so the gate
#     numbers bracket the choice); alt alternates per pair.
# Executor shuffle dirs: session.get_spark exports SPARK_LOCAL_DIRS to
# the tmpfs dir for local-cluster masters — round-2 pairs unknowingly
# ran executor shuffle on the slow /tmp virtio disk (the conf-only
# spark.local.dir is ignored by local-cluster executors), measured this
# round as a 1.5x wall hit at the 4N level.
# CORES picks cores-per-executor (default 8; CORES=2 measured INVERTED
# scaling — tiny executors are shuffle-overhead-bound — see
# bench_records/gate_pair_2core_x144.jsonl).
# EVLOG=1 writes Spark event logs to /tmp/evlog for per-stage
# decomposition (scripts/evparse.py).
OUT=${OUT:-/tmp/gate.jsonl}
REP=${REP:-1152}
CORES=${CORES:-8}
MEM=${MEM:-24576}
TMO=${TMO:-2700}
MINCAL=${MINCAL:-0.93}
WAITMAX=${WAITMAX:-1800}
ORDER=${ORDER:-4nfirst}
SCALE_OPS=${SCALE_OPS:-pip,knn}
export SPARK_GRAFT_QUERY_REP=${QREP:-4}
PAIRS=${PAIRS:-4}
cd /root/repo

if [ "${EVLOG:-0}" = "1" ]; then
  mkdir -p /tmp/sparkconf /tmp/evlog
  printf 'spark.eventLog.enabled true\nspark.eventLog.dir file:///tmp/evlog\n' \
    > /tmp/sparkconf/spark-defaults.conf
  export SPARK_CONF_DIR=/tmp/sparkconf
fi

# 30-s hypervisor-steal reading (% of machine, /proc/stat field 8) —
# the r6 tick-accounting discovery (spatialgraft/steal.py): cheaper
# than the busy-loop probe, measures the thief directly, and matches
# the per-op steal_pct now recorded inside every level.
steal30() {
  python - <<'PY'
import time
def t():
    with open("/proc/stat") as f: p=f.readline().split()
    return int(p[8]), time.time()
s1,w1=t(); time.sleep(30); s2,w2=t()
import os
print(f"{100.0*(s2-s1)/((w2-w1)*(os.cpu_count() or 1)*os.sysconf('SC_CLK_TCK')):.2f}")
PY
}

# memory-bus probe (spatialgraft/membw.py): the third contention
# channel — a co-tenant streaming the bus throttles the bus-bound 4N
# kNN while steal ticks AND the ALU probe read clean (the r6 4N-kNN
# anomaly's candidate signature).  Aggregate triad GB/s at 2 and 8
# procs; on this box a quiet bus reads ~26 / ~93 GB/s (r6 reference).
membw() { python -m spatialgraft.membw 2 8; }

probe() {
  CAL_LO=$CORES CAL_HI=$((CORES*4)) python - <<'PY'
import multiprocessing as mp, os, time
def burn(n):
    x=0
    for i in range(n): x+=i*i
    return x
def run(p,n=8_000_000):
    t0=time.perf_counter()
    with mp.Pool(p) as pool: pool.map(burn,[n]*p*4)
    return time.perf_counter()-t0
lo=int(os.environ["CAL_LO"]); hi=int(os.environ["CAL_HI"])
tl=run(lo); th=run(hi)
print(f"{(hi*4/th)/(lo*4/tl)/4:.3f}")
PY
}

level() {  # $1 = executor count
  SPARK_GRAFT_EXECUTORS=$1 SPARK_GRAFT_EXEC_CORES=$CORES \
  SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=$MEM \
  SPARK_GRAFT_SCALE_OPS=$SCALE_OPS \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  timeout $TMO python bench.py --scaling-one 2>/tmp/gate_$1.err | tail -1
}

# window gate: ambient steal must read < MAXSTEAL% over 30 s AND the
# busy-loop probe must pass AND the 8-proc triad bandwidth must read
# >= MINBW GB/s — the steal check catches thieves the point-probe
# integrates away, the probe catches CPU caps that don't surface as
# steal ticks, and the bandwidth floor catches the BUS thief that
# passes both (the r6 adjudication: 4N kNN walls of 508-861 s vs 240 s
# clean, with steal <= 2%, cal >= 0.93, and membw p8 swinging
# 105 -> 23 GB/s on the same afternoon — the same leg at two checkouts
# read 508.13 vs 508.63 s back-to-back, pinning every slow reading on
# the bus, not the code)
MAXSTEAL=${MAXSTEAL:-1.0}
MINBW=${MINBW:-85}
for i in $(seq 1 $PAIRS); do
  waited=0
  # one-Spark-JVM-at-a-time protocol (the r5 contaminated-A/B lesson):
  # never probe, let alone fire, while any other Spark JVM is live.
  # Every sleep counts toward WAITMAX (ADVICE r6: unbounded JVM waits
  # let a wedged/leaked JVM stall the window hunt forever).
  while pgrep -f "org.apache.spark" > /dev/null && [ $waited -lt $WAITMAX ]; do
    sleep 60; waited=$((waited+60)); done
  st=$(steal30); cal=$(probe); bw=$(python -m spatialgraft.membw 8 | python -c "import json,sys; print(json.load(sys.stdin)['membw_p8_gbs'])")
  while python -c "import sys; sys.exit(0 if (float('$cal') < $MINCAL or float('$st') > $MAXSTEAL or float('$bw') < $MINBW) else 1)" && [ $waited -lt $WAITMAX ]; do
    sleep 30; waited=$((waited+30))
    while pgrep -f "org.apache.spark" > /dev/null && [ $waited -lt $WAITMAX ]; do
      sleep 60; waited=$((waited+60)); done
    st=$(steal30); cal=$(probe); bw=$(python -m spatialgraft.membw 8 | python -c "import json,sys; print(json.load(sys.stdin)['membw_p8_gbs'])")
  done
  this_order=$ORDER
  if [ "$ORDER" = "alt" ]; then
    if [ $((i % 2)) -eq 1 ]; then this_order=4nfirst; else this_order=nfirst; fi
  fi
  bw0=$(membw)
  if [ "$this_order" = "4nfirst" ]; then
    first=$(level 4); bwmid=$(membw); calmid=$(probe); second=$(level 1)
    n4=$first; n1=$second
  else
    first=$(level 1); bwmid=$(membw); calmid=$(probe); second=$(level 4)
    n1=$first; n4=$second
  fi
  bw1=$(membw)
  echo "{\"pair\": $i, \"order\": \"$this_order\", \"ops\": \"$SCALE_OPS\", \"rep\": $REP, \"qrep\": $SPARK_GRAFT_QUERY_REP, \"cores_per_exec\": $CORES, \"cpu_calibration_prefirst\": $cal, \"steal30_prefirst_pct\": $st, \"cpu_calibration_mid\": $calmid, \"waited_for_window_s\": $waited, \"membw_gate_p8\": $bw, \"membw_pre\": $bw0, \"membw_mid\": $bwmid, \"membw_post\": $bw1, \"N\": ${n1:-null}, \"4N\": ${n4:-null}}" >> $OUT
done
