"""Blocked record linkage (fuzzy entity resolution) on name columns.

A crawl/training pipeline constantly reconciles dirty string keys —
near-duplicate titles, misspelled product/entity mentions — against a
canonical catalog. The classic scale-safe recipe is BLOCKING: never
compare all pairs; generate cheap candidate keys, equi-join on them,
and run the expensive edit-distance only within blocks.

Scale shape (10^9-name catalog):
  * candidates come from equi-joins on short block keys — ordinary
    shuffle joins whose volume is the sum of block sizes squared, not
    |catalog|^2; skewed blocks are the known hazard (cap block size or
    salt the key upstream).
  * `levenshtein` is a JVM builtin (whole-stage codegen) — no Python
    in the hot path.
  * multi-pass blocking (two keys here) trades recall for cost
    linearly: each extra pass is one more equi-join, unioned and
    deduped before the distance filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_name_pairs", "resolve_mentions"]


def blocked_name_pairs(
    df: DataFrame, *, name_col: str = "p_name", max_dist: int = 3
) -> DataFrame:
    """All distinct-name pairs within edit distance max_dist, blocked
    on the first whitespace token (pairs differing in the first token
    are out of scope by construction — documented recall tradeoff).
    Returns (name_a, name_b, dist) with name_a < name_b."""
    names = (
        df.select(F.col(name_col).alias("name"))
        .distinct()
        .withColumn("blk", F.split(F.col("name"), r"\s+").getItem(0))
    )
    a = names.select(F.col("name").alias("name_a"), "blk")
    b = names.select(F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


def _block_keys(name: F.Column) -> list[F.Column]:
    """Two cheap blocking keys: 3-char prefix of the first token and
    3-char prefix of the last token — a misspelling must corrupt BOTH
    token heads to escape every pass."""
    toks = F.split(name, r"\s+")
    return [
        F.concat(F.lit("h:"), F.substring(toks.getItem(0), 1, 3)),
        F.concat(
            F.lit("t:"),
            F.substring(F.element_at(toks, -1), 1, 3),
        ),
    ]


def resolve_mentions(
    mentions: DataFrame,
    catalog: DataFrame,
    *,
    mention_col: str = "mention",
    name_col: str = "p_name",
    max_dist: int = 3,
) -> DataFrame:
    """Resolve each dirty mention to its best catalog name: candidates
    via two blocking passes (unioned, deduped), best = min edit
    distance with lexicographic tie-break, kept only if <= max_dist.
    Returns (mention, matched_name, dist)."""
    m = mentions.select(F.lower(F.col(mention_col)).alias("mention"))
    c = catalog.select(F.lower(F.col(name_col)).alias("name")).distinct()

    def keyed(df: DataFrame, col: str) -> DataFrame:
        return df.select(
            col, F.explode(F.array(*_block_keys(F.col(col)))).alias("blk")
        )

    cand = (
        keyed(m, "mention")
        .join(keyed(c, "name"), "blk")
        .select("mention", "name")
        .distinct()
        .withColumn("dist", F.levenshtein("mention", "name"))
        .filter(F.col("dist") <= max_dist)
    )
    best = cand.groupBy("mention").agg(
        F.min(F.struct("dist", "name")).alias("b")
    )
    return best.select(
        "mention",
        F.col("b.name").alias("matched_name"),
        F.col("b.dist").alias("dist"),
    )
