#!/usr/bin/env python3
"""Dump the executed physical plan of every registry query to stdout (or
a file) — the human-readable companion to tests/test_plans.py's pinned
shapes. Use it to audit pushdown/broadcast/shuffle structure after a
change:

    python scripts/explain_report.py [sf_dir] [--out plans.txt]

Each section is `== name ==` followed by the executedPlan string. A
one-line summary per query counts the load-bearing operators (scans,
exchanges, broadcasts, Python stages, windows) so a diff of two reports
surfaces structural drift immediately.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MARKERS = [
    ("scan", r"FileScan|BatchScan"),
    ("exchange", r"Exchange hashpartitioning"),
    ("single_part_exchange", r"Exchange SinglePartition"),
    ("broadcast", r"BroadcastExchange"),
    ("bhj", r"BroadcastHashJoin"),
    ("smj", r"SortMergeJoin"),
    ("bnlj", r"BroadcastNestedLoopJoin"),
    ("cartesian", r"CartesianProduct"),
    ("window", r"\bWindow\b"),
    ("take_ordered", r"TakeOrderedAndProject"),
    ("python", r"MapInPandas|ArrowEvalPython|BatchEvalPython|MapInArrow"),
    ("hash_agg", r"HashAggregate"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import __spark_entry__ as E
    from high_performance_docling_spark.pipeline import get_spark

    spark = get_spark("explain-report", master="local[4]",
                      shuffle_partitions=8)
    sink = open(args.out, "w") if args.out else sys.stdout
    summary = []
    for name, fn in E.queries().items():
        try:
            df = fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # a query that cannot build is the finding
            sink.write(f"== {name} ==\nERROR: {e}\n\n")
            summary.append((name, {"ERROR": 1}))
            continue
        counts = {
            label: len(re.findall(rx, plan)) for label, rx in MARKERS
        }
        summary.append((name, counts))
        sink.write(f"== {name} ==\n{plan}\n")
    sink.write("\n== summary ==\n")
    for name, counts in summary:
        nz = ", ".join(f"{k}={v}" for k, v in counts.items() if v)
        sink.write(f"{name}: {nz}\n")
    if args.out:
        sink.close()
        print(f"wrote {args.out} ({len(summary)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
