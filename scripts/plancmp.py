"""Dump the NORMALIZED executed plan of the gate-shaped kNN join.

Bisection tool for wall-clock anomalies on this co-tenant box: when a
gate reading moves, the first question is "did the plan change?".  Run
this at two git revisions (a worktree for the old one) and diff the
outputs — expression ids, plan ids, and cache-relation numbers are
normalized away, so byte-identical files mean Catalyst planned the
same physical join and the anomaly is environmental.

Round-6 precedent: the r6 2-core gate pair read kNN 3x slower than
r5's at both levels while PIP got FASTER; this tool proved HEAD and
the r5 commit plan-identical at the gate shape (eager, cached,
broadcast_queries=False, replicated-explode input), pinning the
anomaly on ambient steal, not code (BENCH_BASELINE.md round 6).

Usage: python scripts/plancmp.py OUT.txt  (run from the repo root)
"""

import os
import re
import sys

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402

from spatialgraft import datagen  # noqa: E402
from spatialgraft.extract import with_geometry  # noqa: E402
from spatialgraft.ops.knn import knn_join  # noqa: E402
from spatialgraft.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1]
    spark = get_spark("plancmp", cpus=4, shuffle_partitions=8)
    sf = os.environ["SPARK_GRAFT_SF_DIR"]
    base = with_geometry(datagen.documents_spans(spark, sf))
    rep = int(os.environ.get("SPARK_GRAFT_REPLICATE", "4"))
    pts = (base.withColumn(
        "_r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
        .withColumn("doc_key", F.col("doc_key") * rep + F.col("_r"))
        .drop("_r"))
    qs = datagen.knn_queries(spark, sf)
    res = knn_join(pts, qs, k=10, broadcast_queries=False,
                   cache_input=True, materialize=True)
    plan = res._jdf.queryExecution().executedPlan().toString()
    plan = re.sub(r"#\d+", "#X", plan)
    plan = re.sub(r"\(\d+\)", "(N)", plan)
    plan = re.sub(r"id=\d+", "id=X", plan)
    with open(out, "w") as f:
        f.write(plan)
    print("rows", res.count(), "->", out)
    spark.stop()


if __name__ == "__main__":
    main()
