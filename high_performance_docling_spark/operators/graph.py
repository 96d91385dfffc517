"""Link-graph operators: PageRank as iterated join + aggregation.

A training-data pipeline ranks crawl sources by link authority (the
domain-authority signal next to url_domain_stats' volume counts). The
testdata has no link column, so the registry query derives a
DETERMINISTIC synthetic link graph from doc ids via the portable
md5 hash idiom (each doc links to n_links hash-chosen targets) — the
graph construction is itself part of what the oracle replays.

Scale shape (per iteration):
  * contributions = edges ⋈ ranks on src (both sides partitioned by
    the same key if edges are bucketed by src — zero-shuffle join),
    then ONE groupBy(dst) aggregation (map-side partial combine).
  * ranks live at node grain (|V| rows), never materialized wider.
  * Spark-specific: a long lineage of iterations must be cut —
    checkpoint/localCheckpoint every ~5 rounds at real scale (the
    registry query runs 3, well under plan-depth pain).

Cross-engine determinism: per-edge contributions and per-node ranks
are rounded to 9 decimals every iteration; in-degrees are small
(Poisson(n_links)) so the per-node sum has a handful of addends and
summation order cannot move the 6-decimal output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["degree_oriented_edges", "hash_link_edges", "pagerank"]


def hash_link_edges(nodes: DataFrame, *, n_links: int = 3,
                    id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic directed edge set: node i links to
    md5("pr<j>:<i>") mod N for j in 1..n_links (self-loops dropped,
    parallel edges collapsed). Returns (src, dst)."""
    n = nodes.select(F.count(F.lit(1)).alias("n_nodes"))
    tgt = [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"pr{j}:"),
                                   F.col("src").cast("string"))),
                    1, 14,
                ),
                16, 10,
            ).cast("bigint"),
            F.col("n_nodes"),
        ).alias("dst")
        for j in range(1, n_links + 1)
    ]
    return (
        nodes.select(F.col(id_col).alias("src"))
        .crossJoin(F.broadcast(n))
        .select("src", F.explode(F.array(*tgt)).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank(nodes: DataFrame, edges: DataFrame, *, n_iter: int = 3,
             damping: float = 0.85, id_col: str = "doc_id") -> DataFrame:
    """Power-iteration PageRank with uniform teleport. Dangling nodes
    (no out-edges) simply don't contribute — the same simplification
    the oracle replays. Returns (doc_id, rank) with rank at 9-decimal
    iteration precision (callers round to 6 for output)."""
    n = nodes.select(F.count(F.lit(1)).alias("n_nodes"))
    ids = nodes.select(F.col(id_col).alias("node"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = ids.crossJoin(F.broadcast(n)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), 9).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg"), 9).alias("w"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("w").alias("s"))
        ranks = (
            ids.join(sums, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
        )
    return ranks.select(F.col("node").alias(id_col), "rank")


def degree_oriented_edges(edges: DataFrame) -> DataFrame:
    """Symmetrize + dedup a directed edge list, then orient every
    undirected edge toward its (higher-degree, then higher-id) endpoint
    — the total order pi = (degree, id). Returns (a, b) with
    pi(a) < pi(b). Out-degrees under pi are O(sqrt(m)), which bounds
    the wedge join in :func:`triangle_counts`."""
    und = edges.select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
    ).distinct()
    deg = (
        und.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    # u < v always holds here, so the (deg, id) tie-break reduces to
    # "keep u->v unless deg(u) > deg(v)"
    fwd = F.col("du") <= F.col("dv")
    return (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over a DIRECTED edge list (symmetrized
    internally) with DEGREE-ORDERED orientation (Cohen 2009 / Suri &
    Vassilvitskii 2011): orient each undirected edge toward the
    (higher-degree, then higher-id) endpoint, join wedges e1=(a,b) x
    e2=(b,c), close against e3=(a,c). Under the total order
    pi = (degree, id) a triangle pi(x)<pi(y)<pi(z) carries oriented
    edges x->y, y->z, x->z, so the wedge join produces it exactly once
    (at center y) and the result set is identical to any other
    one-per-triangle orientation (e.g. plain id order). Returns
    (node, n_triangles) for nodes in >= 1 triangle.

    Why degree order: with id order a degree-d hub whose id falls
    mid-range emits O(d^2) wedge rows (in(h) x out(h)); pointing every
    edge at its higher-degree endpoint gives out-degree O(sqrt(m)) per
    node, bounding total wedge work at O(m^1.5) on ANY graph — the
    power-law-crawl-graph hazard the id orientation left open. Costs
    one extra |V|-row degree aggregation + two node-keyed joins, all
    map-side-combinable."""
    oriented = degree_oriented_edges(edges)
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e1.a") == F.col("e3.a"))
            & (F.col("e2.b") == F.col("e3.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank_converged(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    tol: float = 1e-6,
    max_iter: int = 50,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    id_col: str = "doc_id",
) -> tuple[DataFrame, int]:
    """Run power iterations until max |rank - prev| < tol (the
    production mode next to the registry's fixed-3-iteration replay).
    Driver-side loop with one tiny max-agg action per iteration (the
    kmeans-fit pattern); every `checkpoint_every` rounds the rank
    frame is localCheckpoint()ed to cut lineage — without it the plan
    tree, not the data, becomes the bottleneck past ~10 iterations.
    Returns (ranks, n_iterations_run)."""
    n = nodes.select(F.count(F.lit(1)).alias("n_nodes"))
    ids = nodes.select(F.col(id_col).alias("node"))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = ids.crossJoin(F.broadcast(n)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), 9).alias("rank")
    )
    it = 0
    for it in range(1, max_iter + 1):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.round(F.col("rank") / F.col("deg"), 9).alias("w"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("w").alias("s"))
        nxt = (
            ids.join(sums, "node", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                F.round(
                    F.lit(1.0 - damping) / F.col("n_nodes")
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
        )
        if it % checkpoint_every == 0:
            nxt = nxt.localCheckpoint(eager=True)
        delta = (
            nxt.join(
                ranks.select("node", F.col("rank").alias("prev")), "node"
            )
            .agg(F.max(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
            .first()["d"]
        )
        ranks = nxt
        if delta is not None and delta < tol:
            break
    return ranks.select(F.col("node").alias(id_col), "rank"), it
