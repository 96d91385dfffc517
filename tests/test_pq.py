"""Product quantization ANN (operators/similarity.py pq_*): structure
capture on the planted-cluster corpus and exact-recall recovery via
the rerank stage. Cross-engine exactness of the registry entries
(embedding_pq_ann, embedding_pq_rerank) is scripts/verify_queries.py's
job; this file pins the QUALITY claims recorded in COVERAGE/SCALE."""

from __future__ import annotations

import numpy as np
import pytest

from high_performance_docling_spark.corpus import (
    clustered_embeddings_dataframe,
)
from high_performance_docling_spark.operators import similarity as SIM

N_VECS, N_CLUSTERS, DIM = 1024, 8, 64
QIDS = list(range(8, 18))
SEEDS = list(range(8))  # ids 0..7 are one member per planted cluster


@pytest.fixture(scope="module")
def clustered(spark):
    emb = clustered_embeddings_dataframe(
        spark, n_vecs=N_VECS, n_clusters=N_CLUSTERS, noise=0.05
    ).cache()
    rows = emb.select("vec_id", "cluster_id", "embedding").collect()
    V = {r["vec_id"]: np.array(r["embedding"], float) for r in rows}
    cl = {r["vec_id"]: r["cluster_id"] for r in rows}
    yield emb, V, cl
    emb.unpersist()


def _exact_top5(V, q):
    ids = sorted(V)
    M = np.stack([V[i] for i in ids])
    d = np.linalg.norm(M - V[q], axis=1)
    d[ids.index(q)] = np.inf
    return {ids[j] for j in np.argsort(d)[:5]}


def test_pq_adc_captures_cluster_structure(clustered, spark):
    emb, V, cl = clustered
    top = SIM.pq_topk(
        emb, QIDS, k=5, m_subs=4, n_codes=8, code_seed_ids=SEEDS, dim=DIM
    ).collect()
    got: dict[int, list[int]] = {}
    for r in top:
        got.setdefault(r["query_id"], []).append(r["nbr_id"])
    # every retrieved neighbor comes from the query's planted cluster
    for q, nbrs in got.items():
        assert len(nbrs) == 5
        assert all(cl[n] == cl[q] for n in nbrs)


def test_pq_rerank_recovers_exact_neighbors(clustered, spark):
    emb, V, cl = clustered
    # shortlist = planted cluster size: the coarse PQ cell admits the
    # whole cluster, the exact rerank orders it -> recall@5 = 1.0 with
    # exact distances computed for only 1/8 of the corpus
    top = SIM.pq_topk_rerank(
        emb, QIDS, k=5, shortlist=N_VECS // N_CLUSTERS,
        m_subs=4, n_codes=8, code_seed_ids=SEEDS, dim=DIM,
    ).collect()
    got: dict[int, list[int]] = {}
    for r in top:
        got.setdefault(r["query_id"], []).append(r["nbr_id"])
    recalls = [
        len(_exact_top5(V, q) & set(nbrs)) / 5 for q, nbrs in got.items()
    ]
    assert sum(recalls) / len(recalls) == 1.0


def test_pq_encode_is_projection(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from high_performance_docling_spark.operators.similarity import (
        _base, pq_encode, pq_model,
    )
    cb = pq_model(emb, m_subs=4, n_codes=8,
                  code_seed_ids=list(range(100, 108)), dim=DIM)
    plan = (
        pq_encode(_base(emb, "vec_id", "embedding"), cb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # encoding a 100 TB corpus must not shuffle or join
    assert "Exchange" not in plan and "Join" not in plan
