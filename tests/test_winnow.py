"""Winnowing fingerprints (operators/winnow.py): the published
guarantee — any shared substring of length >= k + w - 1 produces at
least one shared fingerprint — plus density and short-doc edge cases.
Cross-engine exactness of winnow_pairs is scripts/verify_queries.py's
job."""

from __future__ import annotations

from high_performance_docling_spark.operators import winnow as WN

K, W_ = 8, 4
GUARANTEE = K + W_ - 1  # 11 chars


def _fps(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = WN.winnow_fingerprints(df, k=K, w=W_).collect()
    by_doc: dict[int, set] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    return by_doc

def test_winnowing_guarantee_shared_substring_detected(spark):
    shared = "qwertzuiopas"  # 12 > k + w - 1
    rows = [
        (1, f"xxxx{shared}yyyyyyyy"),
        (2, f"zzzzzzzz{shared}vvvv"),
        (3, "completely different content here"),
    ]
    fp = _fps(spark, rows)
    assert fp[1] & fp[2], "shared 12-char substring must share a fingerprint"
    assert not (fp[1] & fp[3])
    assert not (fp[2] & fp[3])


def test_winnowing_density_and_short_docs(spark):
    rows = [
        (1, "abcdefghij" * 10),  # 100 chars
        (2, "tiny"),             # < k: no k-grams at all
        (3, "a" * 10),           # k-grams exist but < guarantee length
        (4, "a" * 11),           # exactly the guarantee length
    ]
    fp = _fps(spark, rows)
    n_pos = 100 - K + 1
    # winnowing keeps roughly 2/(w+1) of positions; allow generous slack
    # (repetitive text dedups further via DISTINCT)
    assert 1 <= len(fp[1]) <= n_pos
    assert 2 not in fp  # shorter than k: no fingerprints
    # below k + w - 1 chars there is no full window -> no fingerprints
    assert 3 not in fp
    # at exactly k + w - 1: one window, identical k-grams -> exactly 1
    assert len(fp.get(4, set())) == 1


def test_winnowing_is_deterministic(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog")]
    assert _fps(spark, rows) == _fps(spark, rows)
