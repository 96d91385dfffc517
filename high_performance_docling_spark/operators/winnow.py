"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm): the guaranteed-detection variant of
rolling-hash fingerprinting already in doc_fingerprints. Every match
of length >= k + w - 1 is caught (the winnowing guarantee), with a
fingerprint density of ~2/(w+1) instead of one-per-position.

Pipeline shape:
  1. explode each doc into its character k-gram positions (one narrow
     projection + explode),
  2. hash each k-gram with the portable md5->BIGINT idiom,
  3. sliding-window MINIMUM over w consecutive hashes (a doc-keyed
     window with a ROWS frame — bounded per doc, never partition-less),
  4. distinct (doc, fingerprint),
  5. shared-fingerprint equi-join for pair detection, with
     STOP-FINGERPRINT removal first (a k-gram appearing in more than
     max_df docs carries no signal and would be the hot key that blows
     the join up — the same capping rule as MinHash banding).

Scale: every step is a projection, a doc-keyed window, or a
fingerprint-keyed join whose hot keys were just removed; at 10^12 docs
the fingerprint table is the (sorted, bucketed) index you keep."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = ["winnow_fingerprints", "winnow_shared_pairs"]


def winnow_fingerprints(
    docs: DataFrame, *, k: int = 8, w: int = 4,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Distinct winnowed fingerprints per doc: (doc_id, fp)."""
    txt = F.lower(F.trim(F.col(text_col)))
    n_pos = F.length(txt) - F.lit(k - 1)
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        txt.alias("_t"),
        n_pos.alias("n_pos"),
        F.explode(F.sequence(F.lit(1), F.greatest(n_pos, F.lit(1)))).alias(
            "pos"
        ),
    ).select(
        "doc_id", "pos", "n_pos",
        F.conv(
            F.substring(F.md5(F.expr(f"substring(_t, pos, {k})")), 1, 14),
            16, 10,
        ).cast("bigint").alias("h"),
    )
    wf = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.currentRow, w - 1)
    )
    return (
        grams.withColumn("fp", F.min("h").over(wf))
        .filter(F.col("pos") <= F.col("n_pos") - F.lit(w - 1))
        .select("doc_id", "fp")
        .distinct()
    )


def winnow_shared_pairs(
    fps: DataFrame, *, max_df: int = 25, min_shared: int = 5
) -> DataFrame:
    """Doc pairs sharing >= min_shared fingerprints, after dropping
    fingerprints present in more than max_df docs (stop-fingerprint
    capping — removes the ubiquitous k-grams that carry no signal AND
    are the skew bombs of the self-join)."""
    df_counts = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    rare = fps.join(
        df_counts.filter(F.col("df") <= max_df).select("fp"), "fp"
    )
    a = rare.select(F.col("doc_id").alias("a"), "fp")
    b = rare.select(F.col("doc_id").alias("b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
