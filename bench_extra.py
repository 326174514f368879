"""Extra (non-frozen) measurements for the optimization rounds.

bench.py is FROZEN for the driver's measurement; this file holds the
guide-§1.4 noop-sink isolation runs and component breakdowns cited in
OPTIMIZATION_r07.md.  Methodology mirrors bench.py: warm each shape at
sf0.001 then at the target sf, measure N reps, report median + spread,
with a per-rep hypervisor-steal trace and memory-bus brackets so dirty
windows are visible in the record.

Usage:
  python bench_extra.py [component ...]
Components (default: all):
  pipeline        documents_spans -> noop (synthesis only)
  extract_full    with_geometry (all columns) -> noop
  extract_slim    with_geometry projected to doc_key/mx/my -> noop
  <query>         any declared query -> noop sink (not .count())
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from spatialgraft import datagen, membw  # noqa: E402
from spatialgraft.extract import with_geometry  # noqa: E402
from spatialgraft.session import get_spark  # noqa: E402
from spatialgraft.steal import StealTrace  # noqa: E402


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark("spatialgraft-bench-extra", cpus=cpus)
    qs = entrymod.queries()

    def comp_pipeline(sf):
        return datagen.documents_spans(spark, sf)

    def comp_extract_full(sf):
        return with_geometry(datagen.documents_spans(spark, sf))

    def comp_extract_slim(sf):
        return with_geometry(datagen.documents_spans(spark, sf),
                             columns=["doc_key", "mx", "my"])

    comps: dict = {"pipeline": comp_pipeline,
                   "extract_full": comp_extract_full}
    # slim projection exists only after the r07 change; tolerate both
    import inspect
    if "columns" in inspect.signature(with_geometry).parameters:
        comps["extract_slim"] = comp_extract_slim
    for name, fn in qs.items():
        comps.setdefault(name, lambda sf, _f=fn: _f(spark, sf))

    want = sys.argv[1:] or ["pipeline", "extract_full", "extract_slim",
                            "range_join_count", "range_join_pairs",
                            "knn_join", "pip_join_count", "tiles_points",
                            "tiles_boxes"]
    want = [w for w in want if w in comps]

    # warm at tiny sf then target sf (codegen/JIT/python workers)
    for warm_sf in ("/root/testdata/sf0.001", sf_dir):
        for name in want:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            _noop(comps[name](warm_sf))

    bw_pre = membw.probe(8)
    runs: dict[str, list[float]] = {n: [] for n in want}
    steals: dict[str, list[float]] = {n: [] for n in want}
    for _ in range(reps):
        for name in want:
            spark.sparkContext.setJobDescription(f"measure:{name}")
            with StealTrace() as tr:
                t0 = time.perf_counter()
                _noop(comps[name](sf_dir))
                runs[name].append(round(time.perf_counter() - t0, 3))
            steals[name].append(tr.summary()["steal_pct"])
    bw_post = membw.probe(8)

    out = {
        "metric": "noop_component_sec",
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": cpus, "reps": reps,
        "medians": {n: round(statistics.median(v), 3)
                    for n, v in runs.items()},
        "spread": {n: [min(v), max(v)] for n, v in runs.items()},
        "steal_pct": steals,
        "membw_p8_gbs": [bw_pre, bw_post],
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
