"""Ranked text retrieval over the document corpus (BM25).

The reference engine exposes keyword search over extracted document
text (the query layer consumed by document_assembler.py's downstream
consumers); here the same capability is a pure DataFrame plan:

  tokenize -> explode -> per-(doc,term) tf -> per-term df -> BM25.

Scale shape (100 TB corpus, 1000 executors):
  * The explode+groupBy for tf is filtered to the QUERY TERMS FIRST,
    so the shuffle carries only rows whose token is one of the ~10
    query terms — a tiny fraction of the corpus token stream; the
    filter sits inside the same whole-stage-codegen span as the scan.
  * df (document frequency) and the corpus stats (N, avgdl) reduce to
    a handful of scalars — broadcast back, never a second big shuffle.
  * Per-document state is one float accumulator over <= |terms| rows;
    the final top-k is a single ORDER BY ... LIMIT k (Spark's
    TakeOrderedAndProject — no full sort at scale).

Cross-engine determinism: every per-term contribution is rounded to
9 decimals before the per-doc sum (<= |terms| addends, so the sum
order cannot move the 6-decimal output), and the final score uses the
round(x, 6) + 0.0 idiom so IEEE -0.0 never leaks into the canon hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores", "DEFAULT_K1", "DEFAULT_B"]

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    *,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document containing >= 1 query term with Okapi BM25.

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))   (Robertson-Sparck
              Jones with the +1 floor, as in Lucene's BM25Similarity)
    w(t, d) = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

    Returns (doc_id, n_terms_matched, score) — one row per matching
    document, score rounded to 6 (order/tie-breaks are the caller's).
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
    ).select("doc_id", F.explode("_toks").alias("tok"), F.size("_toks").alias("dl"))

    # Corpus stats: N docs and average doc length — two scalars.
    stats = docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"),
    )

    # tf over QUERY TERMS ONLY (filter precedes the shuffle).
    tf = (
        base.filter(F.col("tok").isin(list(terms)))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))

    contrib = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.round(
                F.col("idf")
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                ),
                9,
            ),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_matched"),
        (F.round(F.sum("w"), 6) + F.lit(0.0)).alias("score"),
    )
