"""As-of join — a custom temporal operator Spark's built-ins lack.

For each LEFT event, find the latest RIGHT event of the same key with
right.ts <= left.ts (the classic trades↔quotes join). Implemented
Spark-first as a tagged UNION + one window pass:

    union(left tagged 1, right tagged 0)
      → window partitionBy(key) orderBy(ts, tag, seq) rows unbounded
        preceding → last(right payload, ignoreNulls)
      → filter tag = 1

Shape at scale: ONE shuffle on the key (no join explosion, no range
join); skew on hot keys is the same groupBy-key skew AQE skew-join
handles. Right rows sort before left rows at equal ts, giving the
standard inclusive (<=) as-of semantics; the right side is deduplicated
per (key, ts) first so ties are deterministic.

DuckDB oracles this natively with ASOF LEFT JOIN — an independent
implementation, which is exactly what the correctness gate wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_seq: str,
) -> DataFrame:
    """Inclusive as-of join. ``right_seq`` breaks (key, ts) ties on the
    right side (max kept). Output: left_cols + asof_<right_col> (null
    when no right row precedes)."""
    dedup_w = W.partitionBy(key, ts).orderBy(F.desc(right_seq))
    r = (
        right.withColumn("__rn", F.row_number().over(dedup_w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    tagged = left.select(
        F.col(key).alias("__k"), F.col(ts).alias("__ts"), F.lit(1).alias("__tag"),
        F.struct(*[F.col(c) for c in left_cols]).alias("__l"),
        F.lit(None).cast(
            r.select(F.struct(*[F.col(c) for c in right_cols]).alias("s")).schema["s"].dataType
        ).alias("__r"),
    ).unionByName(
        r.select(
            F.col(key).alias("__k"), F.col(ts).alias("__ts"), F.lit(0).alias("__tag"),
            F.lit(None).cast(
                left.select(F.struct(*[F.col(c) for c in left_cols]).alias("s")).schema["s"].dataType
            ).alias("__l"),
            F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
        )
    )
    w = (
        W.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = (
        tagged.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    sel = [F.col(f"__l.{c}").alias(c) for c in left_cols] + [
        F.col(f"__last_r.{c}").alias(f"asof_{c}") for c in right_cols
    ]
    return out.select(*sel)
