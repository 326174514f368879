#!/bin/bash
# Decisive control for the r6 4N-kNN anomaly: the same 4N knn-only leg
# (local-cluster[4,2,4096], x2304 = 1.05B docs) run back-to-back at
# HEAD and at the round-5 commit (4c152fe, git worktree .wt-r5), ABA
# order, inside one window, one Spark JVM at a time.
#
# Both r6 2-core gate pairs read 4N kNN ~2.7x r5 (641-726 s vs
# 238-240 s) while the SAME legs' PIP beat every r5 reading and the
# N-leg kNN reproduced r5 exactly — a signature steal ticks (~2%) and
# the ALU probe cannot explain, but a MEMORY-BUS co-tenant can (kNN's
# 4N wall is 57% bus-bound slim-cache build; PIP is codegen
# arithmetic).  plancmp proved HEAD plans byte-identical to r5's, but
# plan identity can't rule out a runtime-side regression — this ABA
# does: r5 slow too => environment (bus thief); r5 fast while HEAD
# slow twice => real regression, go bisect.
#
# Every leg carries its own steal trace (in-bench) plus a bracketing
# membw reading (spatialgraft/membw.py) so the bus-thief hypothesis is
# tested directly rather than by elimination.
set -u
OUT=${OUT:-bench_records/r6_4n_knn_aba.jsonl}
REP=${REP:-2304}
TMO=${TMO:-2700}
cd /root/repo

# one-Spark-JVM-at-a-time protocol: wait out any running gate
while pgrep -f "bench.py --scaling" > /dev/null; do sleep 60; done

leg() {  # $1 = checkout dir, $2 = label
  # per-leg Spark event log (scripts/evparse.py decomposes it): the
  # point of the ABA is WHERE the slow leg's wall goes, not just that
  # it is slow
  mkdir -p /tmp/sparkconf_aba_$2 /tmp/evlog_aba_$2
  printf 'spark.eventLog.enabled true\nspark.eventLog.dir file:///tmp/evlog_aba_%s\n' "$2" \
    > /tmp/sparkconf_aba_$2/spark-defaults.conf
  ( cd "$1" && \
    SPARK_CONF_DIR=/tmp/sparkconf_aba_$2 \
    SPARK_GRAFT_EXECUTORS=4 SPARK_GRAFT_EXEC_CORES=2 \
    SPARK_GRAFT_REPLICATE=$REP SPARK_GRAFT_EXEC_MEM_MB=4096 \
    SPARK_GRAFT_SCALE_OPS=knn SPARK_GRAFT_QUERY_REP=1 \
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    timeout $TMO python bench.py --scaling-one 2>/tmp/aba_$2.err | tail -1 )
}

bw() { python -m spatialgraft.membw 2 8; }
st() {
  python - <<'PY'
from spatialgraft.steal import read_ticks
import time
s1, b1, w1 = read_ticks(); time.sleep(30); s2, b2, w2 = read_ticks()
import os
ncpu = os.cpu_count() or 1; hz = os.sysconf("SC_CLK_TCK")
print(round(100.0 * (s2 - s1) / ((w2 - w1) * ncpu * hz), 2))
PY
}

bw0=$(bw); st0=$(st)
a1=$(leg /root/repo head_a1)
bwmid1=$(bw)
b=$(leg /root/repo/.wt-r5 r5_b)
bwmid2=$(bw)
a2=$(leg /root/repo head_a2)
bw1=$(bw); st1=$(st)
echo "{\"exp\": \"4n_knn_aba\", \"rep\": $REP, \"steal30_pre_pct\": $st0, \"steal30_post_pct\": $st1, \"membw_pre\": $bw0, \"membw_mid_after_head\": $bwmid1, \"membw_mid_after_r5\": $bwmid2, \"membw_post\": $bw1, \"head_a1\": ${a1:-null}, \"r5_b\": ${b:-null}, \"head_a2\": ${a2:-null}}" >> $OUT
