#!/bin/bash
# Round-5 gate session.  Runs the gate-default engine, which after the
# round-5 A/B matrix (bench_records/r5_ab4n_x2304.jsonl, BENCH_BASELINE
# round-5 section) is the r4 incumbent: cached slim projection,
# unsalted, eager (SPARK_GRAFT_KNN_SALT=0 / KNN_CACHE=1 defaults in
# bench.py).  The first knn-only pair (r5_gate_x2304_knn_nfirst.jsonl)
# ran the since-rejected salt8+uncached config and is retained as the
# ratio-gaming cautionary record (better ratio from worse walls).
set -u
cd /root/repo
mkdir -p bench_records
R=bench_records

# Pair B — the headline gate protocol (pip,knn N-first), champion engine
OUT=$R/r5_gate_x2304_nfirst.jsonl REP=2304 QREP=1 MEM=4096 CORES=8 \
  SCALE_OPS=pip,knn ORDER=nfirst PAIRS=1 TMO=2700 WAITMAX=900 \
  bash scripts/gate_pairs.sh

# Pair C — the 2-core isolation pair (VERDICT r4 item 2, r3 item 4b):
# 1x2 vs 4x2 executors = 2..8 cores peak, under any plausible host CPU
# cap and far below bus saturation at BOTH levels, so the N->4N ratio
# measures engine overheads, not shared-memory bandwidth.
OUT=$R/r5_gate_2core_x2304.jsonl REP=2304 QREP=1 MEM=4096 CORES=2 \
  SCALE_OPS=pip,knn ORDER=nfirst PAIRS=1 TMO=5400 WAITMAX=900 \
  bash scripts/gate_pairs.sh

echo DONE
