"""Round-6 curation operators: LM perplexity scoring (lm_score), URL /
domain parsing (url_ops) and C4-style segment dedup with reconstruction
(dedup.segment_dedup). Each is pinned against an independent pure-Python
reference here; their registry entries are additionally cross-checked
against DuckDB oracles by scripts/verify_queries.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from high_performance_docling_spark.operators import dedup as DD
from high_performance_docling_spark.operators import lm_score as LM
from high_performance_docling_spark.operators import url_ops as UO


# ---------------------------------------------------------------- lm_score

LM_DOCS = [
    (0, "the cat sat"),
    (1, "the cat ran"),
    (2, "a dog"),
    (3, "solo"),
    (4, ""),
]


def _py_bigram_reference(rows):
    """Independent add-one bigram LM implementation (plain dicts)."""
    toks = {i: t.lower().strip().split() for i, t in rows}
    vocab = {w for ts in toks.values() for w in ts if ts}
    # empty text tokenizes to [''] under the \s+ split contract
    for i, t in rows:
        if t.strip() == "":
            vocab.add("")
    v = len(vocab)
    bigrams = {
        i: list(zip(ts, ts[1:])) for i, ts in toks.items()
    }
    c12: dict = {}
    c1: dict = {}
    for bs in bigrams.values():
        for b in bs:
            c12[b] = c12.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            out[i] = (0, 0.0, 1.0)
            continue
        lps = [
            math.log((c12[b] + 1.0) / (c1[b[0]] + v)) for b in bs
        ]
        avg = round(sum(lps) / len(lps), 6)
        out[i] = (len(bs), avg, round(math.exp(-avg), 4))
    return out


def test_score_documents_matches_python_reference(spark):
    df = spark.createDataFrame(LM_DOCS, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logp"], r["ppl"])
        for r in LM.score_documents(df).collect()
    }
    want = _py_bigram_reference(LM_DOCS)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=2e-6), i
        assert got[i][2] == pytest.approx(want[i][2], abs=2e-4), i


def test_score_documents_foreign_model_unseen_floor(spark):
    train = spark.createDataFrame([(0, "x y")], ["doc_id", "text"])
    score = spark.createDataFrame([(9, "z w")], ["doc_id", "text"])
    lm = LM.train_bigram_lm(train)
    row = LM.score_documents(score, lm=lm).collect()[0]
    # unseen context and bigram: ln((0+1)/(0+V)) with V=2 -> ppl 2.0
    assert row["n_bigrams"] == 1
    assert row["avg_logp"] == pytest.approx(math.log(0.5), abs=1e-6)
    assert row["ppl"] == pytest.approx(2.0, abs=1e-4)


def test_perplexity_filter_keeps_low_ppl_head(spark):
    # doc 2 repeats one bigram 4x -> high probability -> low perplexity
    docs = [
        (0, "p q r s t u"),
        (1, "u t s r q p"),
        (2, "m m m m m"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    scores = {
        r["doc_id"]: r["ppl"] for r in LM.score_documents(df).collect()
    }
    assert scores[2] < scores[0] and scores[2] < scores[1]
    kept = LM.perplexity_filter(df, max_ppl=scores[2]).collect()
    assert [r["doc_id"] for r in kept] == [2]
    assert set(kept[0].asDict()) >= {"doc_id", "text", "ppl", "avg_logp"}


def test_train_min_count_prunes_to_laplace_floor(spark):
    # with min_count=2 the once-seen bigram (y,z) is pruned from the
    # model and scores as an unseen event: (0+1)/(c1+V), not (1+1)/(c1+V)
    train = spark.createDataFrame(
        [(0, "x y x y y z")], ["doc_id", "text"]
    )
    lm = LM.train_bigram_lm(train, min_count=2)
    score = spark.createDataFrame([(1, "y z")], ["doc_id", "text"])
    row = LM.score_documents(score, lm=lm).collect()[0]
    # c1(y)=3, V=3 -> ln(1/6)
    assert row["avg_logp"] == pytest.approx(math.log(1 / 6), abs=1e-6)


# ----------------------------------------------------------------- url_ops

def test_parse_url_columns_cases(spark):
    urls = [
        (0, "https://News.BBC.co.uk:8080/world/asia/index.html?q=1#frag"),
        (1, "http://example.com"),
        (2, "https://localhost/a"),
        (3, "https://cdn.sample.org/x/"),
        (4, "not a url"),
    ]
    df = UO.parse_url_columns(
        spark.createDataFrame(urls, ["doc_id", "url"])
    )
    rows = {r["doc_id"]: r for r in df.collect()}
    r0 = rows[0]
    assert r0["url_host"] == "news.bbc.co.uk"  # lowercased, port stripped
    assert r0["url_domain"] == "bbc.co.uk"  # second-level TLD -> 3 labels
    assert r0["url_path_depth"] == 3
    assert r0["url_has_query"] == 1
    assert rows[1]["url_host"] == "example.com"
    assert rows[1]["url_domain"] == "example.com"
    assert rows[1]["url_path_depth"] == 0
    assert rows[1]["url_has_query"] == 0
    assert rows[2]["url_domain"] == "localhost"  # single label stays
    assert rows[3]["url_path_depth"] == 1  # trailing slash: one segment
    assert rows[4]["url_host"] == ""  # unparseable -> empty, not error
    assert rows[4]["url_domain"] == ""


def test_domain_stats_rollup(spark):
    urls = [
        (0, "https://a.example.com/p?x=1", 10),
        (1, "https://b.example.com/p/q", 30),
        (2, "https://other.net/", 50),
    ]
    out = {
        r["domain"]: r
        for r in UO.domain_stats(
            spark.createDataFrame(urls, ["doc_id", "url", "n_chars"]),
            weight_col="n_chars",
        ).collect()
    }
    ex = out["example.com"]
    assert ex["n_docs"] == 2 and ex["n_hosts"] == 2
    assert ex["n_query_urls"] == 1
    assert ex["avg_path_depth"] == pytest.approx(1.5)
    assert ex["avg_n_chars"] == pytest.approx(20.0)
    assert out["other.net"]["n_docs"] == 1


# ----------------------------------------------------------- segment_dedup

def test_segment_dedup_reconstruction(spark):
    docs = [
        (0, "a b c d e f g h i j k l m n o p"),
        (1, "a b c d e f g h x0 x1 x2 x3 x4 x5 x6 x7"),
        (2, "i j k l m n o p"),
        (3, "q r s"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = {r["doc_id"]: r for r in DD.segment_dedup(df).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    # doc 0 owns both of its segments (lowest doc_id wins)
    assert (rows[0]["n_segs"], rows[0]["n_kept"]) == (2, 2)
    assert rows[0]["text_dedup"] == docs[0][1]
    # doc 1 loses its first segment to doc 0, keeps its unique tail
    assert (rows[1]["n_segs"], rows[1]["n_kept"]) == (2, 1)
    assert rows[1]["text_dedup"] == "x0 x1 x2 x3 x4 x5 x6 x7"
    # doc 2 is entirely a duplicate of doc 0's second segment
    assert (rows[2]["n_segs"], rows[2]["n_kept"]) == (1, 0)
    assert rows[2]["text_dedup"] == ""
    # short unique doc survives whole; empty doc yields zero segments
    assert rows[3]["text_dedup"] == "q r s"
    assert (rows[4]["n_segs"], rows[4]["n_kept"]) == (0, 0)


def test_segment_dedup_is_idempotent(spark):
    docs = [
        (0, "a b c d e f g h i j k l m n o p"),
        (1, "a b c d e f g h x0 x1 x2 x3 x4 x5 x6 x7"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    once = DD.segment_dedup(df)
    again = DD.segment_dedup(
        once.select("doc_id", F.col("text_dedup").alias("text"))
    )
    r = {x["doc_id"]: x for x in again.collect()}
    assert r[0]["text_dedup"] == docs[0][1]
    assert r[1]["text_dedup"] == "x0 x1 x2 x3 x4 x5 x6 x7"
    assert all(x["n_segs"] == x["n_kept"] for x in r.values())


# ----------------------------------------------------- decontaminate_bloom

BLOOM_DOCS = [
    # 13-token doc duplicated verbatim into the benchmark
    (0, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"),
    # shares no 13-gram with the benchmark
    (1, "y0 y1 y2 y3 y4 y5 y6 y7 y8 y9 y10 y11 y12 y13"),
    # sub-13-token doc: the whole text is its single shingle
    (2, "short doc"),
]
BLOOM_BENCH = [(100, BLOOM_DOCS[0][1]), (101, "short doc")]


def _bloom_frames(spark):
    from high_performance_docling_spark.operators import cleaning as CL

    docs = spark.createDataFrame(BLOOM_DOCS, ["doc_id", "text"])
    bench = spark.createDataFrame(BLOOM_BENCH, ["doc_id", "text"])
    return CL, docs, bench


def test_bloom_no_false_negatives_matches_exact(spark):
    # exact-hit counts must equal the exact path's n_hits for EVERY doc,
    # at any filter size (Bloom has no false negatives by construction)
    CL, docs, bench = _bloom_frames(spark)
    exact = {
        r["doc_id"]: r["n_hits"]
        for r in CL.decontaminate(docs, bench, n=13).collect()
    }
    for n_bits in (64, 1 << 20):
        out = {
            r["doc_id"]: r
            for r in CL.decontaminate_bloom(
                docs, bench, n=13, n_bits=n_bits
            ).collect()
        }
        assert set(out) == set(exact)
        for d, n_hits in exact.items():
            assert out[d]["n_exact_hits"] == n_hits, (n_bits, d)
            assert out[d]["n_bloom_hits"] >= n_hits
            assert out[d]["n_false_pos"] == (
                out[d]["n_bloom_hits"] - out[d]["n_exact_hits"]
            )
            assert out[d]["contaminated"] == int(n_hits > 0)


def test_bloom_large_filter_has_no_false_positives(spark):
    # at 2^20 bits over a handful of shingles, FP probability ~ 1e-18:
    # the screen IS the exact answer
    CL, docs, bench = _bloom_frames(spark)
    out = CL.decontaminate_bloom(docs, bench, n=13, n_bits=1 << 20)
    assert out.filter(F.col("n_false_pos") != 0).count() == 0


def test_bloom_positions_bounded_by_bits(spark):
    CL, docs, bench = _bloom_frames(spark)
    pos = CL.bloom_positions(bench, n=13, n_hashes=3, n_bits=16)
    vals = [r["pos"] for r in pos.collect()]
    assert len(vals) == len(set(vals)) <= 16
    assert all(0 <= v < 16 for v in vals)


# ------------------------------------------------------------ psl domains

PSL_CASES = {
    # host -> (public_suffix, registrable_domain)
    "example.com": ("com", "example.com"),
    "www.example.com": ("com", "example.com"),
    "news.bbc.co.uk": ("co.uk", "bbc.co.uk"),  # longest rule wins
    "a.blogspot.com": ("blogspot.com", "a.blogspot.com"),  # private suffix
    "foo.bar.ck": ("bar.ck", "foo.bar.ck"),  # *.ck wildcard
    "www.ck": ("ck", "www.ck"),  # !www.ck exception
    "x.www.ck": ("ck", "www.ck"),  # exception matched as suffix
    "ck": ("ck", ""),  # host IS a public suffix
    "localhost": ("localhost", ""),  # unlisted single label
    "data.ac.jp": ("ac.jp", "data.ac.jp"),
    "deep.sub.shop.com.au": ("com.au", "shop.com.au"),
    "": ("", ""),  # unparseable host propagates empty
}


def test_registrable_domain_psl_cases(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(PSL_CASES)], ["doc_id", "url_host"]
    )
    out = UO.registrable_domain_psl(df, spark)
    rows = {r["url_host"]: r for r in out.collect()}
    assert len(out.columns) == 4  # helper columns dropped
    for host, (pub, dom) in PSL_CASES.items():
        assert rows[host]["psl_public_suffix"] == pub, host
        assert rows[host]["psl_domain"] == dom, host


def test_registrable_domain_psl_no_row_duplication(spark):
    # 'ck' carries a plain AND a wildcard rule on the same join key —
    # the per-length rule slices must collapse them to one row
    df = spark.createDataFrame(
        [(i, "foo.bar.ck") for i in range(7)], ["doc_id", "url_host"]
    )
    assert UO.registrable_domain_psl(df, spark).count() == 7


# ------------------------------------------------- weighted sampling + hll

def test_sample_weighted_matches_python_reference(spark):
    """Top-k by u^(1/w) recomputed independently with hashlib/math."""
    import hashlib

    from high_performance_docling_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["sample_weighted"](spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text").collect()
    keys = {}
    for r in docs:
        w = max(len(r["text"]), 1)
        h = int(hashlib.md5(f"ws:{r['doc_id']}".encode()).hexdigest()[:13], 16)
        keys[r["doc_id"]] = (math.log((h + 1) / float(1 << 52)) / w, w)
    top = sorted(keys.items(), key=lambda kv: (-kv[1][0], kv[0]))[:100]
    # selection is by RAW key; presentation re-sorts by the rounded key
    top = sorted(top, key=lambda kv: (-round(kv[1][0], 6), kv[0]))
    assert [r["doc_id"] for r in out] == [d for d, _ in top]
    for r, (d, (k, w)) in zip(out, top):
        assert r["weight"] == w
        assert abs(r["es_key"] - round(k, 6)) < 1e-9


def test_sample_weighted_prefers_heavy_docs(spark):
    """E-S with 100x weight must dominate the sample (property, not
    statistics: P(any specific light doc beating a 100x-heavier one) is
    tiny, and the draw is deterministic — this pins the weighting is
    actually applied, not just computed)."""
    from high_performance_docling_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["sample_weighted"](spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    ws = [r["weight"] for r in out]
    # sampled mean weight exceeds the corpus mean weight
    allw = spark.read.parquet(f"{sf}/documents.parquet").select(
        F.avg(F.greatest(F.length("text"), F.lit(1)))).first()[0]
    assert len(out) == min(100, docs)
    assert sum(ws) / len(ws) > allw


def test_hll_estimate_within_error_bound(spark):
    """m=64 -> relative standard error 1.04/8 = 13%; assert 4 sigma."""
    from high_performance_docling_spark.entry_queries import QUERIES

    out = QUERIES["hll_distinct_sketch"](spark, "/root/testdata/sf0.01").collect()
    assert len(out) > 0
    for r in out:
        assert r["n_exact"] > 0
        rel = abs(r["hll_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 0.52, (r["event_type"], r["hll_estimate"], r["n_exact"])


def test_domain_balanced_sample_caps_heavy_domains(spark):
    """Inverse-domain-frequency weights must pull per-domain shares
    toward uniform: every domain represented, and the three 2-host
    domains (50% of the corpus) capped well below their raw share.
    Deterministic draw — these are exact facts about the fixed sample,
    not statistics."""
    from collections import Counter

    from high_performance_docling_spark.entry_queries import QUERIES

    rows = QUERIES["domain_balanced_sample"](
        spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 64
    c = Counter(r["domain"] for r in rows)
    assert len(c) == 9  # every registrable domain present
    heavy = c["example.com"] + c["www.ck"] + c[""]  # 2 hosts each
    assert heavy < 0.45 * 64  # raw corpus share would be ~50%
    assert max(c.values()) <= 22  # ~3x the uniform expectation


# ------------------------------------------------------------- bpe training

def _py_bpe_reference(word_freqs, n_merges):
    """Independent classic BPE trainer (Sennrich et al.): plain dicts,
    sequential greedy merge."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    out = []
    for it in range(1, n_merges + 1):
        counts = {}
        for syms, f in words.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((it, l, r, n))
        new = {}
        for syms, f in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new[tuple(res)] = new.get(tuple(res), 0) + f
        words = new
    return out


def test_bpe_train_matches_python_reference(spark):
    """Overlap-heavy vocabulary: 'aaaa' forces the left==right greedy
    case, 'abab' the repeated-pair case."""
    from high_performance_docling_spark.operators import text_analysis as TA2

    vocab = {"aaaa": 10, "abab": 6, "banana": 4, "aab": 3}
    words = spark.createDataFrame(
        [(list(w), f) for w, f in vocab.items()], ["syms", "freq"]
    )
    got = TA2.bpe_train(words, n_merges=4)
    want = _py_bpe_reference({tuple(w): f for w, f in vocab.items()}, 4)
    assert got == want


def test_bpe_merge_pair_single_symbol_word(spark):
    from high_performance_docling_spark.operators import text_analysis as TA2

    words = spark.createDataFrame([(["x"], 1), (["a", "b"], 2)], ["syms", "freq"])
    merges = TA2.bpe_train(words, n_merges=1)
    assert merges == [(1, "a", "b", 2)]
