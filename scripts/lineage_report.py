#!/usr/bin/env python3
"""Summarize per-partition lineage rows written by the pipeline stages.

Usage: python scripts/lineage_report.py <lineage_dir>
Prints one line per stage: partitions, input rows, output rows, total and
p95 wall ms — the Spark analogue of the reference's per-run timer dump
(gpu_processor.py:333-363).
"""

from __future__ import annotations

import json
import os
import sys


def main(lineage_dir: str) -> None:
    stages: dict[str, list[dict]] = {}
    for fname in sorted(os.listdir(lineage_dir)):
        if not fname.endswith(".jsonl"):
            continue
        with open(os.path.join(lineage_dir, fname)) as f:
            for line in f:
                row = json.loads(line)
                stages.setdefault(row["stage"], []).append(row)
    from high_performance_docling_spark.util import fmt_secs

    for stage, rows in sorted(stages.items()):
        walls = sorted(r["wall_ms"] for r in rows)
        p95 = walls[int(0.95 * (len(walls) - 1))]
        print(
            f"{stage:12s} partitions={len(rows):4d} "
            f"in={sum(r['input_rows'] for r in rows):8d} "
            f"out={sum(r['output_rows'] for r in rows):8d} "
            f"wall_total={fmt_secs(sum(walls) / 1000.0):>10s} "
            f"p95={fmt_secs(p95 / 1000.0):>9s}"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".lineage")
