#!/bin/bash
# Runs N/4N scaling pairs back-to-back, recording ambient CPU-scaling
# calibration with each pair. Appends JSON lines to $OUT.
OUT=${OUT:-/tmp/gate.jsonl}
REP=${REP:-288}
export SPARK_GRAFT_QUERY_REP=${QREP:-8}
PAIRS=${PAIRS:-4}
cd /root/repo
for i in $(seq 1 $PAIRS); do
  cal=$(python - <<'PY'
import multiprocessing as mp, time
def burn(n):
    x=0
    for i in range(n): x+=i*i
    return x
def run(p,n=8_000_000):
    t0=time.perf_counter()
    with mp.Pool(p) as pool: pool.map(burn,[n]*p*4)
    return time.perf_counter()-t0
t8=run(8); t32=run(32)
print(f"{(128/t32)/(32/t8)/4:.3f}")
PY
)
  n1=$(SPARK_GRAFT_EXECUTORS=1 SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=24576 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout 900 python bench.py --scaling-one 2>/dev/null | tail -1)
  n4=$(SPARK_GRAFT_EXECUTORS=4 SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=24576 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 timeout 900 python bench.py --scaling-one 2>/dev/null | tail -1)
  echo "{\"pair\": $i, \"cpu_calibration\": $cal, \"N\": $n1, \"4N\": $n4}" >> $OUT
done
