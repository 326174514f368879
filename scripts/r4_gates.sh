#!/bin/bash
# Round-4 gate session: three x2304 pairs (slim-reproduce, full-3-op,
# N-first) + the engine-free bare-sort probe pair.  Runs everything
# SEQUENTIALLY (never two Spark JVMs at once) via gate_pairs.sh, which
# waits for probe-verified clean windows per pair.
set -u
cd /root/repo
mkdir -p bench_records
R=bench_records

# Pair A — reproduce the r3 slim protocol on the round-4 engine
OUT=$R/r4_gate_x2304_repro.jsonl REP=2304 QREP=1 MEM=4096 CORES=8 \
  SCALE_OPS=pip,knn ORDER=4nfirst PAIRS=1 TMO=2700 WAITMAX=900 \
  bash scripts/gate_pairs.sh

# Pair B — full 3-op workload (ADVICE r2 #5 / VERDICT r3 item 3)
OUT=$R/r4_gate_x2304_3op.jsonl REP=2304 QREP=1 MEM=4096 CORES=8 \
  SCALE_OPS=pip,knn,range ORDER=4nfirst PAIRS=1 TMO=2700 WAITMAX=900 \
  bash scripts/gate_pairs.sh

# Pair C — N-measured-first ordering (protocol bracket)
OUT=$R/r4_gate_x2304_nfirst.jsonl REP=2304 QREP=1 MEM=4096 CORES=8 \
  SCALE_OPS=pip,knn ORDER=nfirst PAIRS=1 TMO=2700 WAITMAX=900 \
  bash scripts/gate_pairs.sh

# Bare-sort probe pair (engine-free bus evidence, VERDICT r3 item 4)
for EX in 1 4; do
  SORTPROBE_EXECUTORS=$EX SORTPROBE_ROWS=1000000000 \
    timeout 2700 python scripts/sortprobe.py 2>/tmp/sortprobe_$EX.err \
    | tail -1 >> $R/r4_sortprobe_pair.jsonl
done
echo DONE
