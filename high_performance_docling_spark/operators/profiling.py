"""One-scan column profiling (the data-quality report a pipeline runs
before training on a new table).

All metrics for all columns come from ONE aggregation over ONE scan —
null counts, distinct counts, min/max — then a stack() unpivot turns
the single wide row into the (col_name, metrics...) report. min/max
are computed in the column's native type (so numeric order, not
lexicographic) and cast to string only in the report.

Scale shape: the profile is a global aggregate with map-side partial
combine; the only expensive members are the exact count_distincts,
which Catalyst plans via Expand (one input row fans out per distinct
aggregate). At 100 TB swap count_distinct for approx_count_distinct
(HLL, constant state, same one-pass shape) — exact is kept here
because the DuckDB oracle must match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile the given columns in one pass. Returns one row per
    column: (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)
    with min/max rendered as strings."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return wide.select(
        "n_rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_val, max_val)"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
