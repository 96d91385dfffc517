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
    for stage, rows in sorted(stages.items()):
        walls = sorted(r["wall_ms"] for r in rows)
        p95 = walls[int(0.95 * (len(walls) - 1))]
        print(
            f"{stage:12s} partitions={len(rows):4d} "
            f"in={sum(r['input_rows'] for r in rows):8d} "
            f"out={sum(r['output_rows'] for r in rows):8d} "
            f"wall_total={sum(walls):9.1f}ms p95={p95:8.1f}ms"
        )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".lineage")
