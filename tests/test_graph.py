"""PageRank (operators/graph.py) pinned against an independent
pure-Python power-iteration reference; the registry entry
(link_pagerank) is additionally cross-checked against the unrolled
DuckDB oracle by scripts/verify_queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from high_performance_docling_spark.operators import graph as G

# A small fixed digraph with a dangling node (3) and a popular hub (0).
EDGES = [(0, 1), (0, 2), (1, 0), (2, 0), (4, 0), (4, 3)]
NODES = [0, 1, 2, 3, 4]


def _py_pagerank(nodes, edges, n_iter=3, d=0.85):
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(n_iter):
        inc = {v: 0.0 for v in nodes}
        for s, t in edges:
            inc[t] += round(rank[s] / outdeg[s], 9)
        rank = {
            v: round((1.0 - d) / n + d * inc[v], 9) for v in nodes
        }
    return rank


def test_pagerank_matches_python_reference(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], ["doc_id"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["doc_id"]: r["rank"]
        for r in G.pagerank(nodes, edges, n_iter=3).collect()
    }
    assert got == _py_pagerank(NODES, EDGES)


def test_pagerank_mass_ordering(spark):
    # Hub 0 receives from three nodes; dangling node 3 only from one
    # and contributes nothing onward — ranks must reflect that.
    nodes = spark.createDataFrame([(v,) for v in NODES], ["doc_id"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["doc_id"]: r["rank"]
        for r in G.pagerank(nodes, edges, n_iter=5).collect()
    }
    assert got[0] == max(got.values())
    assert got[4] == min(got.values())  # nothing links to 4


def test_hash_link_edges_shape(spark):
    nodes = spark.createDataFrame([(v,) for v in range(50)], ["doc_id"])
    e = G.hash_link_edges(nodes, n_links=3)
    rows = e.collect()
    # no self loops, no parallel edges, targets in [0, N)
    assert all(r["src"] != r["dst"] for r in rows)
    assert len(rows) == len({(r["src"], r["dst"]) for r in rows})
    assert all(0 <= r["dst"] < 50 for r in rows)
    # determinism: a second evaluation yields the identical edge set
    assert {(r["src"], r["dst"]) for r in rows} == {
        (r["src"], r["dst"]) for r in e.collect()
    }
    # out-degree is bounded by n_links
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d")).collect()
    assert all(1 <= r["d"] <= 3 for r in deg)


def test_triangle_counts_known_graphs(spark):
    # K4: 4 triangles, every node participates in C(3,2) = 3
    k4 = [(i, j) for i in range(4) for j in range(4) if i != j]
    e = spark.createDataFrame(k4, ["src", "dst"])
    got = {r["node"]: r["n_triangles"]
           for r in G.triangle_counts(e).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    # one triangle + a pendant edge: node 3 is in no triangle
    g2 = [(0, 1), (1, 2), (2, 0), (2, 3)]
    e2 = spark.createDataFrame(g2, ["src", "dst"])
    got2 = {r["node"]: r["n_triangles"]
            for r in G.triangle_counts(e2).collect()}
    assert got2 == {0: 1, 1: 1, 2: 1}
    # direction / duplicate edges don't change the undirected count
    e3 = spark.createDataFrame(g2 + [(1, 0), (0, 2)], ["src", "dst"])
    got3 = {r["node"]: r["n_triangles"]
            for r in G.triangle_counts(e3).collect()}
    assert got3 == got2


def test_pagerank_converged_reaches_fixpoint(spark):
    nodes = spark.createDataFrame([(v,) for v in NODES], ["doc_id"])
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    # damping 0.5 so the geometric convergence rate (damping^k) hits
    # tol within a test-sized iteration budget
    ranks, it = G.pagerank_converged(
        nodes, edges, tol=1e-6, max_iter=30, damping=0.5,
        checkpoint_every=5,
    )
    got = {r["doc_id"]: r["rank"] for r in ranks.collect()}
    assert it < 30  # converged, didn't hit the cap
    # fixpoint: one more fixed iteration moves nothing beyond tol
    again = {
        r["doc_id"]: r["rank"]
        for r in G.pagerank(
            nodes, edges, n_iter=it + 1, damping=0.5
        ).collect()
    }
    assert all(abs(got[v] - again[v]) < 1e-6 for v in got)
    # mass never exceeds 1 (dangling mass is dropped)
    assert sum(got.values()) <= 1.0 + 1e-9
    # ordering matches the structural expectation
    assert got[0] == max(got.values())
