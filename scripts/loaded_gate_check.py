#!/usr/bin/env python3
"""Adversarial validation of the bench scaling gate: run the ABBA
interleaved N→4N measurement WHILE a deliberate co-tenant load spins,
and report whether the paired-ratio median still clears 0.8.

VERDICT r5 #1's done-criteria: the restructured protocol must pass not
only on the driver's (possibly noisy) host but on a DELIBERATELY loaded
one. This script is that experiment, reusing bench.py's own machinery
(_ensure_corpus, _interleaved_scaling) so the measured code path is
byte-identical to the real bench; only the environment differs.

The load generator is ``n_load`` unpinned pure-Python spin processes —
the scheduler migrates them freely, exactly like the co-tenant traffic
that contaminated BENCH_r05.json (driver loadavg 11-25 at leg starts).

Usage: python scripts/loaded_gate_check.py [n_load] [k_pairs]
Writes one JSON line to stdout; exit 0 iff efficiency >= 0.8.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SPIN = "import time\nwhile True:\n    x = 0\n    for i in range(100000):\n        x += i * i\n"


def main() -> int:
    n_load = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import bench

    spark = bench._session(bench.CPUS, "loaded-gate-corpus")
    bench._ensure_corpus(spark)
    spark.stop()
    time.sleep(2)

    la_before = bench._loadavg()
    spinners = [
        subprocess.Popen([sys.executable, "-c", SPIN],
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
        for _ in range(n_load)
    ]
    time.sleep(5)  # let loadavg climb before the first pair
    try:
        small = max(1, bench.CPUS // 8)
        big = max(2, bench.CPUS // 2)
        scaling = bench._interleaved_scaling(small, big, k)
    finally:
        for p in spinners:
            p.kill()
        for p in spinners:
            p.wait()
    eff = scaling["efficiency_median_of_pairs"]
    print(json.dumps({
        "experiment": "deliberately_loaded_scaling_gate",
        "n_load_spinners": n_load,
        "loadavg_before_spin": la_before,
        "loadavg_during": bench.LOADAVG_LOG[-1],
        "k_pairs": k,
        "scaling": scaling,
        "efficiency_median_of_pairs": eff,
        "gate_0_8": "PASS" if eff >= 0.8 else "FAIL",
    }))
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
