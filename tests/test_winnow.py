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


def _py_winnow(text: str, k: int = K, w: int = W_) -> set[int]:
    """Independent reference: same md5->int54 hashes, sliding-min."""
    import hashlib

    t = text.lower().strip()
    n_pos = len(t) - (k - 1)
    if n_pos < w:
        return set()
    hs = [
        int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:14], 16)
        for i in range(n_pos)
    ]
    return {min(hs[i:i + w]) for i in range(n_pos - w + 1)}


def test_winnow_matches_python_reference(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "sphinx of black quartz judge my vow"),
        (4, ""),
    ]
    got = _fps(spark, rows)
    for doc_id, text in rows:
        assert got.get(doc_id, set()) == _py_winnow(text), doc_id


def test_winnow_guarantee_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(alphabet="abcdef", min_size=0, max_size=20),
        st.text(alphabet="abcdef", min_size=0, max_size=20),
        st.text(alphabet="ghijkl", min_size=GUARANTEE, max_size=16),
    )
    def check(pre, post, shared):
        # the shared block uses a disjoint alphabet so its k-grams are
        # unique to it; both docs must share >= 1 fingerprint
        a = _py_winnow(pre + shared + post)
        b = _py_winnow("zzz" + shared + "qqq")
        assert a & b

    check()
