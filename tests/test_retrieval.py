"""BM25 ranked retrieval (operators/retrieval.py) pinned against an
independent pure-Python Okapi implementation; the registry entry
(bm25_search) is additionally cross-checked against the DuckDB oracle
by scripts/verify_queries.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from high_performance_docling_spark.operators import retrieval as RETR

DOCS = [
    (0, "spark spark spark joins the stream"),
    (1, "a window over the stream of rows"),
    (2, "merge sort merge join merge"),
    (3, "nothing relevant here at all"),
    (4, "spark window"),
    (5, ""),
]
TERMS = ["spark", "window", "merge"]


def _py_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().strip().split() if t.strip() else [""] for i, t in rows}
    n = len(rows)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    df = {
        q: sum(1 for ts in toks.values() if q in ts)
        for q in terms
    }
    out = {}
    for i, ts in toks.items():
        score, matched = 0.0, 0
        for q in terms:
            tf = ts.count(q)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            w = idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(ts) / avgdl)
            )
            score += round(w, 9)
        if matched:
            out[i] = (matched, round(score, 6))
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_terms_matched"], r["score"])
        for r in RETR.bm25_scores(docs, TERMS).collect()
    }
    assert got == _py_bm25(DOCS, TERMS)


def test_bm25_nonmatching_docs_absent(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    ids = {r["doc_id"] for r in RETR.bm25_scores(docs, TERMS).collect()}
    assert 3 not in ids and 5 not in ids
    assert ids == {0, 1, 2, 4}


def test_bm25_tf_saturation_monotone(spark):
    # Same doc length, more occurrences of the query term -> higher
    # score, but with diminishing returns (the k1 saturation): the
    # increment from 1->2 occurrences exceeds the one from 2->3.
    rows = [
        (0, "spark pad pad pad pad pad"),
        (1, "spark spark pad pad pad pad"),
        (2, "spark spark spark pad pad pad"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {
        r["doc_id"]: r["score"]
        for r in RETR.bm25_scores(docs, ["spark"]).collect()
    }
    assert s[0] < s[1] < s[2]
    assert (s[1] - s[0]) > (s[2] - s[1])


def test_bm25_plan_broadcasts_stats_and_df(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = RETR.bm25_scores(docs, TERMS)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_absent_term_is_harmless(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    base = {r["doc_id"]: r["score"]
            for r in RETR.bm25_scores(docs, TERMS).collect()}
    with_ghost = {
        r["doc_id"]: r["score"]
        for r in RETR.bm25_scores(docs, TERMS + ["zzzabsent"]).collect()
    }
    # a term with zero postings adds no contribution to anyone
    assert with_ghost == base


def test_bm25_empty_term_list_returns_nothing(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    assert RETR.bm25_scores(docs, []).collect() == []


def test_bm25_length_normalization(spark):
    # same tf, longer doc -> lower score (the b-weighted dl/avgdl term)
    rows = [(0, "spark pad"), (1, "spark pad pad pad pad pad pad pad")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    s = {r["doc_id"]: r["score"]
         for r in RETR.bm25_scores(docs, ["spark"]).collect()}
    assert s[0] > s[1]
