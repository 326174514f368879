#!/bin/bash
# Round-6 follow-up: one clean-window off-vs-qid stage-2-split pair at
# the gate workload (the dirty-window matrix rejected "doc" outright;
# "qid" landed inside the incumbent's 19% drift bracket — this pair
# re-reads that comparison in a probed clean window, incumbent first).
set -u
OUT=${OUT:-bench_records/r6_s2split_pair_clean.jsonl}
REP=${REP:-2304}
MEM=${MEM:-4096}
CORES=${CORES:-8}
TMO=${TMO:-2700}
MINCAL=${MINCAL:-0.93}
WAITMAX=${WAITMAX:-1800}
cd /root/repo
mkdir -p bench_records

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

run_cfg() {  # $1 = tag, $2 = s2split mode
  line=$(SPARK_GRAFT_EXECUTORS=4 SPARK_GRAFT_EXEC_CORES=$CORES \
    SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=$MEM \
    SPARK_GRAFT_SCALE_OPS=knn SPARK_GRAFT_QUERY_REP=1 \
    SPARK_GRAFT_KNN_S2SPLIT=$2 \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    timeout $TMO python bench.py --scaling-one 2>/tmp/s2pair_$1.err | tail -1)
  cal_after=$(probe)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$1\", \"cal_after\": $cal_after, ${line#\{}" >> $OUT
  else
    echo "{\"tag\": \"$1\", \"cal_after\": $cal_after, \"error\": \"empty/timeout\"}" >> $OUT
  fi
  echo "$1 done (cal_after=$cal_after)"
}

waited=0
cal=$(probe)
while { pgrep -f "org.apache.spark" >/dev/null || \
        python -c "import sys; sys.exit(0 if float('$cal') < $MINCAL else 1)"; } \
      && [ $waited -lt $WAITMAX ]; do
  sleep 60; waited=$((waited+60)); cal=$(probe)
done
echo "{\"window\": {\"cal\": $cal, \"waited_s\": $waited}}" >> $OUT
run_cfg off off
run_cfg qid qid
echo DONE
