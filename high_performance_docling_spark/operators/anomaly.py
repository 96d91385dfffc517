"""Robust outlier detection: per-group MAD z-scores (Iglewicz-Hoaglin).

Quality pipelines flag anomalous metric values (crawl latencies, doc
scores, event values) with MEDIAN/MAD, not mean/stddev — one corrupt
batch can drag a mean arbitrarily but moves a median by at most one
rank. score = 0.6745 * (x - median) / MAD, flag |score| > threshold
(3.5 is the published consensus cut).

Scale shape: two group-keyed aggregations (median, then MAD of the
deviations) + one broadcast join back — group stats are tiny, the
events table shuffles on its group key at most once per aggregation.
Exact percentile() keeps the oracle bit-matchable; at 100 TB swap in
percentile_approx / the mergeable histogram rollup (same plan shape,
bounded state) — the documented tradeoff of histogram_quantile_rollup.

Cross-engine determinism: the median, each absolute deviation, the
MAD, and the final score are all rounded to 6 (with the +0.0 negative-
zero guard) so interpolation-order ulps can't flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mad_outliers"]

MAD_CONSISTENCY = 0.6745  # Phi^-1(0.75): MAD -> sigma-equivalent units


def mad_outliers(
    df: DataFrame,
    *,
    group_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 3.5,
) -> DataFrame:
    """Return rows whose robust z-score exceeds the threshold:
    (group, ..., value, med, mad, score). Groups with MAD = 0 (over
    half the values identical) are skipped — the score is undefined
    there and a rank-based test is the right tool instead."""
    r6 = lambda c: F.round(c, 6) + F.lit(0.0)  # noqa: E731
    med = df.groupBy(group_col).agg(
        r6(F.expr(f"percentile({value_col}, 0.5)")).alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "adev", F.abs(F.round(F.col(value_col) - F.col("med"), 6))
    )
    mad = dev.groupBy(group_col).agg(
        r6(F.expr("percentile(adev, 0.5)")).alias("mad")
    )
    scored = (
        dev.join(F.broadcast(mad), group_col)
        .filter(F.col("mad") > 0.0)
        .withColumn(
            "score",
            r6(
                F.lit(MAD_CONSISTENCY)
                * F.round(F.col(value_col) - F.col("med"), 6)
                / F.col("mad")
            ),
        )
    )
    return scored.filter(F.abs(F.col("score")) > F.lit(threshold)).drop(
        "adev"
    )
