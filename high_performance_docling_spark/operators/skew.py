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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: the FACT side gets a deterministic salt in
    [0, n_salts) (derived from `salt_source`, a high-cardinality fact
    column — never random, so replays are identical), the DIM side is
    REPLICATED n_salts times, and the join key becomes (key, salt) —
    one hot key's rows now land on n_salts reducers instead of one.

    Use when AQE's skew-join split can't help (e.g. the hot key's rows
    must still co-locate with a non-broadcastable dim). Cost: dim side
    is written n_salts times across the exchange — size n_salts so
    (|dim| * n_salts) stays well under the fact shuffle it fixes.
    Result is row-identical to fact.join(dim, key) (asserted in
    tests)."""
    if salt_source is None:
        raise ValueError(
            "salt_source is required: a deterministic fact column keeps "
            "replays byte-identical (a random/monotonic salt is not "
            "stable across runs)"
        )
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.abs(F.hash(F.col(salt_source))), F.lit(n_salts))
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_fact.join(exploded_dim, [key, "_salt"]).drop("_salt")
    return out
