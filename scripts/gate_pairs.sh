#!/bin/bash
# Runs N/4N scaling pairs, recording ambient CPU-scaling calibration
# with each pair. Appends JSON lines to $OUT.
#
# Co-tenant steal on this box is invisible to guest load yet throttles
# wide runs (a busy-loop calibration from 8->32 procs swings 0.68-0.97
# by the minute).  Two defenses:
#   - each pair WAITS for a clean window (quick 32-proc probe >= MINCAL,
#     re-checked every 60 s up to WAITMAX s);
#   - the 4N level runs FIRST: clean it finishes in ~2 min, so it fits
#     inside the probed window, while the 8-core N level tolerates
#     bursts (co-tenants rarely consume 24 idle cores for 6 straight
#     minutes).
# CORES picks cores-per-executor (default 8; CORES=2 measured INVERTED
# scaling — tiny executors are shuffle-overhead-bound — see
# bench_records/gate_pair_2core_x144.jsonl).
OUT=${OUT:-/tmp/gate.jsonl}
REP=${REP:-288}
CORES=${CORES:-8}
MEM=${MEM:-24576}
TMO=${TMO:-1200}
MINCAL=${MINCAL:-0.93}
WAITMAX=${WAITMAX:-1800}
export SPARK_GRAFT_QUERY_REP=${QREP:-8}
PAIRS=${PAIRS:-4}
cd /root/repo

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

for i in $(seq 1 $PAIRS); do
  waited=0
  cal=$(probe)
  while python -c "import sys; sys.exit(0 if float('$cal') < $MINCAL else 1)" && [ $waited -lt $WAITMAX ]; do
    sleep 60; waited=$((waited+60)); cal=$(probe)
  done
  n4=$(SPARK_GRAFT_EXECUTORS=4 SPARK_GRAFT_EXEC_CORES=$CORES SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=$MEM SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout $TMO python bench.py --scaling-one 2>/tmp/gate_n4.err | tail -1)
  caln=$(probe)
  n1=$(SPARK_GRAFT_EXECUTORS=1 SPARK_GRAFT_EXEC_CORES=$CORES SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=$MEM SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout $TMO python bench.py --scaling-one 2>/tmp/gate_n1.err | tail -1)
  echo "{\"pair\": $i, \"cores_per_exec\": $CORES, \"cpu_calibration_pre4N\": $cal, \"cpu_calibration_preN\": $caln, \"waited_for_window_s\": $waited, \"N\": ${n1:-null}, \"4N\": ${n4:-null}}" >> $OUT
done
