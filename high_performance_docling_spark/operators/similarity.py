"""Similarity search over embedding columns (array<float>).

Two paths, mirroring what a 100 TB training-data pipeline needs:
  - brute_force_topk: exact cosine top-k via a page/bucket-free
    crossJoin restricted to a (small) query set — the correctness
    baseline. The dot product is a JVM-side ``aggregate`` over
    ``zip_with`` (no Python UDF).
  - lsh_topk: random-hyperplane LSH — deterministic hyperplanes derived
    from md5 of (plane, dim), sign-bit bucket join, exact cosine only
    within matching buckets. This is the scale path: candidates per query
    drop from N to N / 2^planes on average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def _cosine(a, b):
    """Cosine similarity between two array<double> columns (JVM-side)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids. The query
    side is tiny → broadcast; the corpus side streams (no shuffle until
    the per-query top-k window)."""
    base = emb.select(
        F.col(id_col).alias("nbr_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    queries = base.filter(F.col("nbr_id").isin(query_ids)).select(
        F.col("nbr_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        base.crossJoin(F.broadcast(queries))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            F.round(_cosine(F.col("qv"), F.col("v")), round_to).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "nbr_id", "cosine")
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH bucket per vector. Plane p's weight for dimension d is
    derived from md5(p:d) mapped to [-1, 1] — deterministic, engine-free."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def plane_dot(p: int):
        # weight_d = (h56(p:d) % 2001 - 1000) / 1000 using posexplode-free
        # transform with index
        return F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                    lambda d: (
                        F.conv(
                            F.substring(
                                F.md5(F.concat_ws(":", F.lit(str(p)), d.cast("string"))),
                                1,
                                14,
                            ),
                            16,
                            10,
                        ).cast("bigint")
                        % 2001
                        - 1000
                    )
                    / 1000.0,
                ),
                lambda x, wgt: x * wgt,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )

    bucket = None
    for p in range(n_planes):
        bit = F.when(plane_dot(p) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col),
                      bucket.alias("bucket"))


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 5,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with a < b and
    cosine >= threshold. Exact pairwise here (the correctness baseline);
    the scale path pre-filters pairs through hyperplane_buckets so only
    same-bucket candidates pay the dot product."""
    base = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a = base.select(F.col("vid").alias("a"), F.col("v").alias("va"))
    b = base.select(F.col("vid").alias("b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.round(_cosine(F.col("va"), F.col("vb")), round_to).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    round_to: int = 5,
) -> DataFrame:
    """Approximate top-k: exact cosine within matching LSH buckets only."""
    b = hyperplane_buckets(emb, n_planes)
    base = b.select(
        F.col("vec_id").alias("nbr_id"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
        "bucket",
    )
    queries = base.filter(F.col("nbr_id").isin(query_ids)).select(
        F.col("nbr_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        base.join(F.broadcast(queries), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id", "nbr_id",
            F.round(_cosine(F.col("qv"), F.col("v")), round_to).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "rk", "nbr_id", "cosine")
    )
