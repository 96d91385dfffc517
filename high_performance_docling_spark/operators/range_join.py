"""Binned range join — points-in-interval without a nested-loop join.

Spark has no native range join (Databricks' range-join hint is
proprietary); the public scale pattern is BINNING: explode each interval
to the fixed-width buckets it covers, bucket the points, equi-join on the
bucket, then verify the exact containment predicate and dedup (an
interval spanning k buckets meets a point at most once after distinct).

Cost: |intervals| × (len/bucket_width) exploded rows + a hash equi-join —
linear, shuffle on near-uniform bucket keys — versus the O(N·M)
BroadcastNestedLoopJoin Catalyst would pick for a raw BETWEEN theta join.
Bucket width tunes the trade: ~median interval length is a good default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
) -> DataFrame:
    """INNER-join every point row to every interval row with
    start <= ts < end (half-open). Returns points columns + interval
    columns. (No ``how`` parameter by design — the containment predicate
    is applied as a post-join filter, which would silently collapse any
    outer join back to inner semantics; an outer variant needs the
    predicate inside the join condition plus interval-bucket dedup.)"""
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / bucket_width).cast("long")
    )
    iv = intervals.withColumn(
        "__buckets",
        F.sequence(
            F.floor(F.col(start_col) / bucket_width).cast("long"),
            # end is exclusive: a point at exactly `end` doesn't match,
            # so the last candidate bucket is floor((end - ulp)/width);
            # floor(end/width) is a safe (superset) upper bound
            F.floor(F.col(end_col) / bucket_width).cast("long"),
        ),
    ).withColumn("__bucket", F.explode("__buckets")).drop("__buckets")
    joined = p.join(iv, "__bucket").filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    # no dedup needed: a point owns exactly ONE bucket, so each
    # (point, interval) pair can meet at most once
    return joined.drop("__bucket")
