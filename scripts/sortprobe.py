"""Engine-free sort-scaling probe (VERDICT r3 item 4 evidence).

Measures a BARE Spark window sort — no spatialgraft code, no Arrow
extraction, no joins — shaped like the kNN stage-1 pre-rank: rows of
(grp bigint, qid bigint, doc_key bigint, dist2 double) pre-partitioned
by grp so the row_number window sorts in place with no exchange, at
1x8 vs 4x8 local-cluster executors on identical input.

If THIS scales at ~0.45-0.55 on this box while a pure-CPU probe reads
~1.0, the kNN per-op gate residual is the machine's shared memory bus
(sorting is bandwidth-bound), independent of any engine choice.

Usage:
  SORTPROBE_EXECUTORS=1 python scripts/sortprobe.py   # N level
  SORTPROBE_EXECUTORS=4 python scripts/sortprobe.py   # 4N level
Prints one JSON line per run.  Run levels in separate processes
(fresh JVM each), never concurrently.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from spatialgraft.session import get_spark  # noqa: E402


def main() -> None:
    n_exec = int(os.environ.get("SORTPROBE_EXECUTORS", "1"))
    cores = int(os.environ.get("SORTPROBE_EXEC_CORES", "8"))
    mem_mb = int(os.environ.get("SORTPROBE_EXEC_MEM_MB", "4096"))
    # default sized like the x2304 kNN candidate stream (~1e9 rows)
    n_rows = int(os.environ.get("SORTPROBE_ROWS", str(1_000_000_000)))
    n_grps = int(os.environ.get("SORTPROBE_GROUPS", "32768"))
    k = int(os.environ.get("SORTPROBE_K", "10"))
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = f"{mem_mb}m"
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        "sortprobe", cpus=cores * n_exec, shuffle_partitions=64,
        master=f"local-cluster[{n_exec},{cores},{mem_mb}]")
    want = cores * n_exec
    for _ in range(60):
        if spark.sparkContext.defaultParallelism >= want:
            break
        time.sleep(1)

    def stream(rows: int):
        # deterministic synthetic candidate stream, hash-partitioned by
        # grp to the shuffle width (the kNN cache layout), then a
        # row_number window over (grp, qid) that sorts IN PLACE — the
        # exact physical shape of knn stage 1's dominant stage
        base = (spark.range(rows)
                .selectExpr(
                    f"pmod(xxhash64(id), {n_grps}) AS grp",
                    f"pmod(xxhash64(id + 1), {n_grps // 4}) AS qid",
                    "id AS doc_key",
                    "CAST(pmod(xxhash64(id + 2), 1000000) AS DOUBLE) "
                    "/ 1000.0 AS dist2")
                .repartition(64, "grp"))
        w = Window.partitionBy("grp", "qid").orderBy("dist2", "doc_key")
        return (base.withColumn("rnk", F.row_number().over(w))
                .where(F.col("rnk") <= k)
                .agg(F.count("*"), F.sum("dist2")))

    stream(n_rows // 100).collect()  # warm codegen/JIT
    t0 = time.perf_counter()
    out = stream(n_rows).collect()
    wall = time.perf_counter() - t0
    spark.stop()
    print(json.dumps({
        "probe": "bare_window_sort", "executors": n_exec,
        "cores": cores * n_exec, "exec_mem_mb": mem_mb,
        "rows": n_rows, "groups": n_grps, "k": k,
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_rows / wall, 1),
        "result": [str(x) for x in out[0]],
    }))


if __name__ == "__main__":
    main()
