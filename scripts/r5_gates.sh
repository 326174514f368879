#!/bin/bash
# Round-5 gate session.  All pairs run the round-5 engine defaults
# (SPARK_GRAFT_KNN_SALT=8 uniform salt on both kNN join stages,
# SPARK_GRAFT_KNN_CACHE=0 — no input cache at gate scale; see
# bench.py:229-242 for the event-log-measured rationale).  Sequential,
# clean-window-probed, via gate_pairs.sh.
set -u
cd /root/repo
mkdir -p bench_records
R=bench_records

# Pair A — kNN-only, N-first: apples-to-apples against the round-5
# profile pair (bench_records/r5_knnprofile_x2304.jsonl: old engine,
# N 265.1 s / 4N 170.8 s, eff 0.388) so the salt + no-cache win is a
# controlled measurement.
OUT=$R/r5_gate_x2304_knn_nfirst.jsonl REP=2304 QREP=1 MEM=4096 CORES=8 \
  SCALE_OPS=knn ORDER=nfirst PAIRS=1 TMO=2700 WAITMAX=900 \
  bash scripts/gate_pairs.sh

# Pair B — the headline gate protocol (pip,knn N-first), round-5 engine
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
