"""Skew-safe two-phase (salted) aggregation.

A groupBy on a key with hot values concentrates those keys' rows in
single reducer tasks. Salting splits each key into ``n_salts`` subkeys
for a PARTIAL aggregation (phase 1 — the hot key's rows now spread over
n_salts tasks), then re-aggregates the partials by the real key
(phase 2 — n_salts rows per key, trivially small). The result is
IDENTICAL to the direct groupBy (the DuckDB oracle is the plain GROUP
BY), only the shuffle layout changes.

Spark's map-side partial aggregation already does this implicitly for
algebraic aggregates; explicit salting is the pattern for the cases it
can't cover — high-cardinality partials that overflow the hash map,
collect-style aggregates, or a deterministic salt the resume logic can
key on. AQE's skewedJoin handles JOIN skew; this handles AGG skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    salt_expr: Column,
    n_salts: int,
    partial_aggs: list[Column],
    final_aggs: list[Column],
) -> DataFrame:
    """Phase 1: groupBy(key, salt % n_salts) with ``partial_aggs``;
    phase 2: groupBy(key) with ``final_aggs`` over the partial columns."""
    salted = df.withColumn("__salt", salt_expr % n_salts)
    partial = salted.groupBy(key, "__salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs)
