"""Dump .explain('formatted') for every declared query into plans/r07/.

Usage: python scripts/r07_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
  query:  optional subset; default = all declared queries

Driver-side only (no job runs except what plan construction itself
needs, e.g. the kNN eager histogram collect).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from spatialgraft.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("r07-plans")
    qs = entrymod.queries()
    names = sys.argv[2:] or list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # pragma: no cover
            plan = f"ERROR building plan: {e!r}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
