#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named registry queries to files.

    python scripts/dump_plans.py <outdir> <suffix> [query ...]

Writes <outdir>/<query>_<suffix>.txt for each query (round-7 deliverable:
plans/r07/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as E
    from high_performance_docling_spark.pipeline import get_spark

    spark = get_spark("dump-plans", master="local[4]", shuffle_partitions=8)
    qs = E.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
