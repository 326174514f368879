#!/bin/bash
# Round-7 gate A/B (VERDICT r6 items 1 and 4), one probed clean window,
# incumbent bracketed FIRST and LAST per the r6 walls-only-in-certified-
# windows protocol:
#   off       incumbent (bracket open)
#   qid       stage-2 hot-cell split, cover hashed by qid (the r6
#             rejection was provisional: dirty window, qid inside the
#             incumbent's 19% drift bracket)
#   sortcell  cache_sort="cell" — slim cache ordered by (cell) within
#             partitions before persist (stage-2 probe locality vs the
#             measured 2.00x stage-2 CPI inflation)
#   off2      incumbent again (bracket close)
# 8 GiB executors: the r6-certified sizing that removes the 4 GiB
# eviction confound (bench_records/r6_knn_floor_4n_evlog.jsonl).
set -u
OUT=${OUT:-bench_records/r7_knn_ab4n_x2304.jsonl}
REP=${REP:-2304}
MEM=${MEM:-8192}
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

run_cfg() {  # $1 = tag, $2 = s2split mode, $3 = cache_sort mode
  line=$(SPARK_GRAFT_EXECUTORS=4 SPARK_GRAFT_EXEC_CORES=$CORES \
    SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=$MEM \
    SPARK_GRAFT_SCALE_OPS=knn SPARK_GRAFT_QUERY_REP=1 \
    SPARK_GRAFT_KNN_S2SPLIT=$2 SPARK_GRAFT_KNN_CACHE_SORT=$3 \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    timeout $TMO python bench.py --scaling-one 2>/tmp/r7ab_$1.err | tail -1)
  cal_after=$(probe)
  if [ -n "$line" ]; then
    echo "{\"tag\": \"$1\", \"cache_sort\": \"$3\", \"cal_after\": $cal_after, ${line#\{}" >> $OUT
  else
    echo "{\"tag\": \"$1\", \"cache_sort\": \"$3\", \"cal_after\": $cal_after, \"error\": \"empty/timeout\"}" >> $OUT
  fi
  echo "$1 done (cal_after=$cal_after)"
}

# window gate: no live Spark JVM AND raw-CPU calibration >= MINCAL.
# Every sleep counts toward the WAITMAX ceiling (ADVICE r6: the r6
# script's JVM-wait loop slept without incrementing `waited`, so a
# wedged JVM stalled the hunt forever).
waited=0
cal=$(probe)
while { pgrep -f "org.apache.spark" >/dev/null || \
        python -c "import sys; sys.exit(0 if float('$cal') < $MINCAL else 1)"; } \
      && [ $waited -lt $WAITMAX ]; do
  sleep 60; waited=$((waited+60)); cal=$(probe)
done
echo "{\"window\": {\"cal\": $cal, \"waited_s\": $waited, \"mem_mb\": $MEM}}" >> $OUT
run_cfg off off off
run_cfg qid qid off
run_cfg sortcell off cell
run_cfg off2 off off
echo DONE
