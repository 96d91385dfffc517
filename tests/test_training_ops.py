"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from high_performance_docling_spark.operators import (
    dedup as DD,
    multimodal as MM,
    similarity as SIM,
    text_analysis as TA,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_duplicates_groups_identical_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "  A b C "), (3, "different")], ["doc_id", "text"]
    )
    out = {r["keep_id"]: r["n_copies"] for r in DD.exact_duplicates(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_and_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w5"), (3, "x y z q r")],
        ["doc_id", "text"],
    )
    sh = DD.shingles(df, n=3)
    pairs = DD.ngram_jaccard_pairs(sh, threshold=0.9).collect()
    assert [(r["a"], r["b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]


def test_minhash_lsh_finds_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6"), (3, "a b c d e f")],
        ["doc_id", "text"],
    )
    sig = DD.minhash_signatures(DD.shingles(df, n=3), n_hashes=16)
    pairs = DD.lsh_candidate_pairs(sig, n_hashes=16, bands=4).collect()
    assert [(r["a"], r["b"]) for r in pairs] == [(1, 2)]


def test_simhash_identical_docs_equal_fp(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "zz yy xx")],
        ["doc_id", "text"],
    )
    fps = {r["doc_id"]: r["simhash"] for r in DD.simhash(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_brute_force_topk_self_similarity(spark, emb):
    out = SIM.brute_force_topk(emb, [0, 1], k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for rows in by_q.values():
        assert [r["rk"] for r in rows] == [1, 2, 3]
        sims = [r["cosine"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(-1.0 <= s <= 1.0 for s in sims)


def test_lsh_topk_subset_of_bruteforce_scores(spark, emb):
    bf = SIM.brute_force_topk(emb, [0], k=5).collect()
    ann = SIM.lsh_topk(emb, [0], k=5, n_planes=4).collect()
    # ANN scores can't beat exact top-1
    if ann:
        assert ann[0]["cosine"] <= bf[0]["cosine"] + 1e-9


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el perro y la casa de que en"),
            (3, "zzz qqq www"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in TA.language_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_fingerprints_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r["rolling_hash"] for r in TA.fingerprints(df).collect()}
    assert out[1] != out[2]


def test_multimodal_plumbing(spark, docs):
    media = MM.synth_media(docs.limit(30))
    feats = MM.decode_media_batch(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["n_bytes"] == 64  # sha256 hex → 64 bytes
        assert 0.0 <= r["byte_entropy"] <= 8.0
        if r["media_type"] == "video":
            assert r["frame_indexes"].startswith("0")  # comma-joined string
        else:
            assert r["frame_indexes"] == ""
    refs = MM.content_address(media).collect()
    assert all(r["media_ref"].startswith("img:") for r in refs)
    # deterministic across runs
    feats2 = MM.decode_media_batch(MM.synth_media(docs.limit(30))).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_multimodal_real_codec_path_is_guarded(spark, docs):
    with pytest.raises(NotImplementedError):
        MM.decode_media_batch(MM.synth_media(docs.limit(1)), real_codecs=True)


def test_banded_near_dup_pairs_full_recall_vs_brute_force(spark):
    """The registered dedup_embedding_cosine runs the LSH-banded path;
    its oracle is the exact brute-force pair set, so recall must be 100%
    on the driver corpus (deterministic md5 planes make this stable)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = sorted(
        (r["a"], r["b"], r["cosine"])
        for r in SIM.embedding_near_dup_pairs(emb, threshold=0.45).collect()
    )
    banded = sorted(
        (r["a"], r["b"], r["cosine"])
        for r in SIM.banded_near_dup_pairs(
            emb, threshold=0.45, bands=32, planes_per_band=4
        ).collect()
    )
    assert banded == bf and len(bf) > 0


def test_simhash_band_pairs_equals_all_pairs(spark, docs):
    fp = DD.simhash(docs.limit(120), bits=16)
    a, b = fp.alias("a"), fp.alias("b")
    from pyspark.sql import functions as F
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    brute = sorted(
        (r["x"], r["y"], r["hamming"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"),
                ham.alias("hamming"))
        .filter(F.col("hamming") <= 3).collect()
    )
    banded = sorted(
        (r["x"], r["y"], r["hamming"])
        for r in DD.simhash_band_pairs(fp, bits=16, bands=4, max_hamming=3).collect()
    )
    assert banded == brute and len(brute) > 0


def test_ngram_jaccard_stop_shingle_cap(spark):
    # a shingle present in every doc is excluded from the universe when
    # max_shingle_df caps it; jaccard is then over the filtered sets
    rows = [(i, f"common one two unique{i} alpha beta gamma{i%2}") for i in range(6)]
    sh = DD.shingles(spark.createDataFrame(rows, ["doc_id", "text"]), n=3)
    uncapped = DD.ngram_jaccard_pairs(sh, threshold=0.01).collect()
    capped = DD.ngram_jaccard_pairs(sh, threshold=0.01, max_shingle_df=6).collect()
    assert len(uncapped) >= len(capped)
