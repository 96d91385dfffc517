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
    ann = SIM.lsh_topk(emb, [0], k=5, n_planes=4, dim=64).collect()
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


def test_multimodal_real_png_decode(spark, docs):
    """real_codecs=True decodes ACTUAL PNG payloads and computes pixel
    statistics; expectations recomputed independently in NumPy."""
    import numpy as np

    from high_performance_docling_spark.kernels.png_codec import decode_png

    media = MM.synth_png_media(docs.limit(8))
    rows = {r["media_id"]: r for r in media.collect()}
    feats = MM.decode_media_batch(media, real_codecs=True).collect()
    assert len(feats) == 8
    for r in feats:
        did = r["media_id"]
        w, h = did % 640 + 16, did % 480 + 16
        yy, xx = np.mgrid[0:h, 0:w]
        img = ((xx * 3 + yy * 7 + did) % 251).astype(np.uint8)
        # the payload really is that bitmap as a PNG
        assert (decode_png(bytes(rows[did]["payload"])) == img).all()
        # features are over decoded PIXELS, not compressed bytes
        assert r["n_bytes"] == h * w
        assert r["n_bytes"] != len(bytes(rows[did]["payload"]))
        assert abs(r["byte_mean"] - round(float(img.mean()), 6)) < 1e-9


def test_multimodal_video_codec_still_guarded(spark, docs):
    """Images AND audio now have real codecs; only video under
    real_codecs surfaces the NotImplementedError seam (raised
    executor-side). Audio with a non-WAV payload is a decode
    ValueError, not the missing-codec seam."""
    video = MM.synth_media(docs.limit(30)).filter("media_type = 'video'")
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        MM.decode_media_batch(video, real_codecs=True).collect()
    audio = MM.synth_media(docs.limit(30)).filter("media_type = 'audio'")
    with pytest.raises(Exception, match="ValueError|not a readable WAV"):
        MM.decode_media_batch(audio, real_codecs=True).collect()


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
            emb, threshold=0.45, bands=32, planes_per_band=4, dim=64
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


def test_image_ops_kernels():
    """Image-path kernels: render/crop/roi-resize/normalize/preprocess
    shapes and determinism (tf_predictor.py:496-562 + :1117-1174,
    gpu_preprocess.py semantics on the deterministic bitmap stand-in)."""
    import numpy as np

    from high_performance_docling_spark.kernels.image_ops import (
        RENDER_SCALE,
        crop_bitmap,
        crop_table_rois,
        normalize_batch,
        preprocess_layout_batch,
        render_page_bitmap,
    )

    img = render_page_bitmap(612.0, 792.0, [[100, 100, 300, 200], [0, 0, 50, 50]])
    assert img.shape == (198, 153) and img.dtype == np.uint8
    assert img[30, 30] == 255 and img[150, 140] == 0
    img2 = render_page_bitmap(612.0, 792.0, [[100, 100, 300, 200], [0, 0, 50, 50]])
    assert np.array_equal(img, img2)  # deterministic

    crop = crop_bitmap(img, [100, 100, 300, 200], RENDER_SCALE)
    assert crop.shape == (25, 50) and crop.min() == 255  # fully covered box

    rois = crop_table_rois(img, 792.0, [[100, 100, 300, 200], [5, 5, 5, 5]])
    assert len(rois) == 1  # degenerate box skipped
    sf = 1024.0 / 792.0
    assert rois[0]["scale_factor"] == sf
    assert rois[0]["image"].shape == (int(round(100 * sf)), int(round(200 * sf)))
    assert rois[0]["scaled_bbox"] == [100 * sf, 100 * sf, 300 * sf, 200 * sf]

    norm = normalize_batch([crop, img], resized_size=448)
    assert norm.shape == (2, 3, 448, 448) and norm.dtype == np.float32
    # 255 pixel → (1.0 - mean)/std on channel 0
    assert abs(norm[0, 0, 0, 0] - (1.0 - 0.94247851) / 0.17910956) < 1e-5

    pre = preprocess_layout_batch([img, crop])
    assert pre.shape == (2, 3, 640, 640) and pre.dtype == np.float32
    assert pre.max() <= 1.0 and pre.min() >= 0.0  # rescaled, no normalize


def test_extract_figures_joins_with_span_media_refs(spark):
    """Figure sink (document_assembler.py:62-90 role): crop rows join 1:1
    with the picture spans' media_refs from the extraction pipeline."""
    from high_performance_docling_spark.corpus import GenConfig
    from high_performance_docling_spark.operators.figures import extract_figures
    from high_performance_docling_spark.pipeline import (
        docs_dataframe,
        extract_spans,
    )

    cfg = GenConfig(seed=42, n_docs=20)
    docs = docs_dataframe(spark, cfg, num_partitions=4)
    figs = extract_figures(docs, cfg).collect()
    assert len(figs) > 0
    from high_performance_docling_spark.kernels.png_codec import decode_png

    for f in figs:
        assert f["crop_h"] >= 1 and f["crop_w"] >= 1
        # crops are REAL PNG bytes that round-trip to the stated shape
        img = decode_png(bytes(f["crop"]))
        assert img.shape == (f["crop_h"], f["crop_w"])
        assert f["media_ref"].startswith("img:")
    spans = extract_spans(spark, docs, cfg).select("doc_id", "spans").collect()
    span_refs = {
        s["media_ref"]
        for r in spans
        for s in r["spans"]
        if s["kind"] == "picture" and s["media_ref"]
    }
    fig_refs = {f["media_ref"] for f in figs}
    assert span_refs and span_refs <= fig_refs
    # determinism: same crop bytes on a second run
    figs2 = {f["media_ref"]: f["crop_sha"] for f in extract_figures(docs, cfg).collect()}
    assert {f["media_ref"]: f["crop_sha"] for f in figs} == figs2


def test_asof_join_semantics(spark):
    """Inclusive as-of: equal-ts right row is taken; (key, ts) ties on the
    right deduped to max seq; no prior right row → null payload."""
    from high_performance_docling_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10.0, "p1"), (1, 20.0, "p2"), (2, 5.0, "p3")],
        ["k", "t", "pid"],
    )
    right = spark.createDataFrame(
        [(1, 10.0, 100, "r-at-10-a"), (1, 10.0, 101, "r-at-10-b"),
         (1, 15.0, 102, "r-at-15"), (2, 9.0, 103, "r-late")],
        ["k", "t", "seq", "payload"],
    )
    out = {
        r["pid"]: (r["asof_seq"], r["asof_payload"])
        for r in asof_join(
            left, right, key="k", ts="t",
            left_cols=["pid"], right_cols=["seq", "payload"], right_seq="seq",
        ).collect()
    }
    assert out["p1"] == (101, "r-at-10-b")  # inclusive + tie → max seq
    assert out["p2"] == (102, "r-at-15")    # latest at-or-before
    assert out["p3"] == (None, None)        # right row is later → no match


def test_ivf_topk_recall_vs_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bf = SIM.brute_force_topk(emb, list(range(10)), k=5).collect()
    ivf = SIM.ivf_topk(emb, list(range(10)), k=5, n_probe=2).collect()
    bf_pairs = {(r["query_id"], r["nbr_id"]) for r in bf}
    ivf_pairs = {(r["query_id"], r["nbr_id"]) for r in ivf}
    recall = len(bf_pairs & ivf_pairs) / len(bf_pairs)
    # approximate by design; with 8 centroids / 2 probes over near-random
    # vectors expect a meaningful fraction, and never a false score
    assert recall >= 0.2
    assert len(ivf_pairs) == 50
    bf_best = {r["query_id"]: r["cosine"] for r in bf if r["rk"] == 1}
    for r in ivf:
        assert r["cosine"] <= bf_best[r["query_id"]] + 1e-9


def test_salted_agg_equals_direct_groupby(spark):
    from pyspark.sql import functions as F

    from high_performance_docling_spark.operators.skew import salted_agg

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    salted = salted_agg(
        ev, "user_id", F.col("event_id"), 16,
        partial_aggs=[F.sum("value").alias("pv"), F.count(F.lit(1)).alias("pc")],
        final_aggs=[F.round(F.sum("pv"), 2).alias("tv"), F.sum("pc").alias("n")],
    ).collect()
    direct = (
        ev.groupBy("user_id")
        .agg(F.round(F.sum("value"), 2).alias("tv"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, salted)) == sorted(map(tuple, direct))


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation reaches the far end of a chain (needs
    multiple iterations) and keeps islands separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain → comp 1
         (10, 11), (11, 12),                  # triangle-ish → comp 10
         (20, 21)],                           # pair → comp 20
        ["x", "y"],
    )
    out = {r["node"]: r["comp"] for r in DD.connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_gopher_quality_rules(spark):
    """Gopher filter edges: short doc fails word-count floor; a doc with
    long gibberish tokens fails mean-word-length / stopword rules."""
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with joy and it was made of felt "
                "and the day went on and on with more words to say here "
                "about the cat and the mat and the felt and the joy that "
                "it brought to everyone involved in the story today ok"),
            (2, "short doc"),
            (3, " ".join(["zzzzzzzzzzzzzzzzzzzzzz"] * 60)),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TA.gopher_quality(df).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["gopher_pass"] is False  # < 50 words
    assert out[3]["gopher_pass"] is False  # mean word len 22 > 10, no stopwords
    assert out[3]["stopword_hits"] == 0


def test_bpe_token_profile_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! it's 42 pies")], ["doc_id", "text"])
    r = TA.bpe_token_profile(df).collect()[0]
    assert r["n_bpe_tokens"] == 8  # Hello , world ! it 's 42 pies
    assert r["chars_per_token"] == round(26 / 8, 4)


def test_repetition_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),   # heavy repetition
            (2, "all words are fully distinct here now"), # none
            (3, "single"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in TA.repetition_scores(df).collect()}
    assert out[1]["dup_token_frac"] > 0.7
    assert out[1]["top_bigram_char_frac"] > 0.5  # "spam ham" dominates
    assert out[2]["dup_token_frac"] == 0.0
    assert out[3]["top_bigram_char_frac"] == 0.0  # no 2-grams


def test_binned_range_join_equals_theta_join(spark):
    """The binned equi-join must produce exactly the naive BETWEEN join's
    result, including points on bucket boundaries and multi-bucket
    intervals."""
    from pyspark.sql import functions as F

    from high_performance_docling_spark.operators.range_join import (
        binned_range_join,
    )

    pts = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(60)], ["pid", "ts_s"]
    )
    ivs = spark.createDataFrame(
        [(0, 0.0, 10.0), (1, 5.0, 35.0), (2, 35.0, 36.0), (3, 90.0, 100.0),
         (4, 10.0, 10.0)],  # empty interval matches nothing
        ["iid", "start_s", "end_s"],
    )
    binned = {
        (r["pid"], r["iid"])
        for r in binned_range_join(pts, ivs, "ts_s", "start_s", "end_s", 10.0).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in pts.join(
            ivs, (F.col("ts_s") >= F.col("start_s")) & (F.col("ts_s") < F.col("end_s"))
        ).collect()
    }
    assert binned == naive and len(naive) > 0


def test_chunk_documents_windows(spark):
    from high_performance_docling_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(200))),  # 200 toks → 2 chunks
         (2, "tiny doc"),                              # 1 chunk
         (3, " ".join(f"x{i}" for i in range(129)))],  # 129 → 2 chunks
        ["doc_id", "text"],
    )
    out = {(r["doc_id"], r["chunk_id"]): r for r in
           chunk_documents(docs, chunk_size=128, overlap=32).collect()}
    assert {k[0] for k in out} == {1, 2, 3}
    assert out[(1, 0)]["n_tokens"] == 128
    assert out[(1, 1)]["n_tokens"] == 104  # tokens 96..199
    # overlap: chunk 1 starts at token 96 (= 128 - 32)
    assert out[(1, 1)]["chunk_text"].split()[0] == "w96"
    assert out[(2, 0)]["n_tokens"] == 2
    assert (3, 1) in out and out[(3, 1)]["n_tokens"] == 33
    # every token covered exactly (first chunk + strides)
    packed = pack_chunks(chunk_documents(docs, 128, 32), capacity=256).collect()
    bins = {}
    for r in packed:
        bins.setdefault(r["bin_id"], 0)
        bins[r["bin_id"]] += r["n_tokens"]
    # waste bound: every bin except maybe the last holds >= capacity - max_chunk
    for b, tot in bins.items():
        if b != max(bins):
            assert tot >= 256 - 128


def test_quantize_embeddings_error_bound(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from pyspark.sql import functions as F

    qdf = SIM.quantize_embeddings(emb)
    base = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    j = qdf.join(base, "vec_id")
    rows = j.select(
        "vec_id", "scale",
        F.aggregate(
            F.zip_with(F.col("v"), F.col("qvec"),
                       lambda x, q: F.abs(x - q * F.col("scale"))),
            F.lit(0.0), lambda a, e: F.greatest(a, e),
        ).alias("err"),
        F.aggregate(F.transform("qvec", lambda q: F.abs(q)), F.lit(0),
                    lambda a, q: F.greatest(a, q)).alias("qmax"),
    ).collect()
    for r in rows:
        assert r["err"] <= r["scale"] / 2 + 1e-12  # symmetric-quant bound
        assert r["qmax"] <= 127  # int8 range


def test_kmeans_fit_objective_improves_and_is_deterministic(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = SIM._base(emb, "vec_id", "embedding")

    def objective(cents):
        a = SIM.assign_to_centroids(base, cents)
        cmap = {cid: cv for cid, cv in cents}
        sdf = spark.createDataFrame(
            [(cid, cv) for cid, cv in cents], "centroid_id long, cv array<double>"
        )
        return (
            a.join(sdf, "centroid_id")
            .select(F.avg(SIM._cosine(F.col("v"), F.col("cv"))).alias("o"))
            .collect()[0]["o"]
        )

    c0 = SIM.kmeans_fit(emb, k=8, n_iter=0)   # just the md5-ordered seeds
    c3 = SIM.kmeans_fit(emb, k=8, n_iter=3)
    assert objective(c3) > objective(c0)       # Lloyd monotonicity
    assert c3 == SIM.kmeans_fit(emb, k=8, n_iter=3)  # fully deterministic


def test_kmeans_fitted_centroids_beat_seeds_on_ivf_recall(spark):
    # VERDICT r2 #4 done-criterion: fitted > fixed-seed recall vs brute
    # force (at sf0.01, where the clustering structure is visible)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qids = list(range(10))
    truth = {(r.query_id, r.nbr_id)
             for r in SIM.brute_force_topk(emb, qids, k=5).collect()}
    seed = {(r.query_id, r.nbr_id)
            for r in SIM.ivf_topk(emb, qids, k=5, n_probe=2).collect()}
    cents = SIM.kmeans_fit(emb, k=8, n_iter=3)
    fit = {(r.query_id, r.nbr_id)
           for r in SIM.ivf_topk(emb, qids, k=5, n_probe=2,
                                 centroids=cents).collect()}
    assert len(fit & truth) > len(seed & truth)


def test_ann_recall_far_above_scan_fraction_on_clustered_corpus(spark):
    """VERDICT r5 #5: on a planted-cluster corpus (the structure real
    embedding spaces have, which the driver's isotropic synthetics
    lack) both ANN paths must recall far MORE than their candidate-scan
    fraction — proof the index captures structure, not merely that cost
    is proportional to scan. Deterministic generator, so the numbers
    are stable."""
    from high_performance_docling_spark.corpus import (
        clustered_embeddings_dataframe,
    )

    emb = clustered_embeddings_dataframe(spark, n_vecs=2000, dim=64,
                                         num_partitions=8).cache()
    n = emb.count()
    qids = [i * 97 % 2000 for i in range(8)]
    denom = len(qids) * (n - 1)
    truth = {(r.query_id, r.nbr_id)
             for r in SIM.brute_force_topk(emb, qids, k=5).collect()}
    # exact neighbors live in the planted cluster (sanity of the fixture)
    cl = {r["vec_id"]: r["cluster_id"] for r in emb.collect()}
    assert all(cl[q] == cl[nb] for q, nb in truth)

    lsh_kw = dict(n_planes=7, dim=64, n_tables=8)
    lsh = {(r.query_id, r.nbr_id)
           for r in SIM.lsh_topk(emb, qids, k=5, **lsh_kw).collect()}
    lsh_scan = SIM.lsh_topk(emb, qids, k=10 ** 6, **lsh_kw).count() / denom
    lsh_recall = len(lsh & truth) / len(truth)
    assert lsh_recall >= 0.9 and lsh_scan <= 0.35
    assert lsh_recall > 2 * lsh_scan

    cents = SIM.kmeans_fit(emb, k=8, n_iter=3)
    ivf = {(r.query_id, r.nbr_id)
           for r in SIM.ivf_topk(emb, qids, k=5, centroids=cents,
                                 n_probe=1).collect()}
    ivf_scan = SIM.ivf_topk(emb, qids, k=10 ** 6, centroids=cents,
                            n_probe=1).count() / denom
    ivf_recall = len(ivf & truth) / len(truth)
    assert ivf_recall >= 0.85 and ivf_scan <= 0.3
    assert ivf_recall > 2 * ivf_scan


def test_bilinear_resize_parity_with_reference_formula():
    """verify_parity.py-style gate (max-abs <= 1e-3): resize_bilinear vs
    an INDEPENDENT scalar-loop implementation of torchvision's
    BILINEAR/antialias=False/align_corners=False semantics."""
    import numpy as np

    from high_performance_docling_spark.kernels.image_ops import (
        resize_area,
        resize_bilinear,
    )

    def ref_bilinear(img, oh, ow):
        ih, iw = img.shape[:2]
        out = np.zeros((oh, ow), dtype=np.float64)
        for i in range(oh):
            y = min(max((i + 0.5) * ih / oh - 0.5, 0.0), ih - 1)
            y0, fy = int(np.floor(y)), 0.0
            fy = y - int(np.floor(y))
            y1 = min(y0 + 1, ih - 1)
            for j in range(ow):
                x = min(max((j + 0.5) * iw / ow - 0.5, 0.0), iw - 1)
                x0 = int(np.floor(x))
                fx = x - x0
                x1 = min(x0 + 1, iw - 1)
                top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
                bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
                out[i, j] = top * (1 - fy) + bot * fy
        return out

    rng = np.random.default_rng(7)
    for (ih, iw), (oh, ow) in [((37, 53), (640, 640)), ((198, 153), (640, 640)),
                               ((64, 64), (17, 29)), ((5, 5), (5, 5))]:
        img = rng.integers(0, 256, size=(ih, iw)).astype(np.float64)
        got = resize_bilinear(img, oh, ow)
        want = ref_bilinear(img, oh, ow)
        assert np.abs(got / 255.0 - want / 255.0).max() <= 1e-3  # rescaled gate
        assert np.abs(got - want).max() <= 1e-9  # and exact in practice

    # hand-computed case: [0, 255] 1x2 -> 1x4 with half-pixel sampling:
    # x = {-0.25, 0.25, 0.75, 1.25} -> clamp -> {0, .25, .75, 1}
    got = resize_bilinear(np.array([[0.0, 255.0]]), 1, 4)
    assert np.allclose(got, [[0.0, 63.75, 191.25, 255.0]])

    # area downscale 4->2 averages disjoint pairs exactly
    got = resize_area(np.array([[0.0, 100.0, 200.0, 60.0]]), 1, 2)
    assert np.allclose(got, [[50.0, 130.0]])
    # fractional span: 3->2, pixel 0 = (a + 0.5*b)/1.5
    got = resize_area(np.array([[30.0, 60.0, 90.0]]), 1, 2)
    assert np.allclose(got, [[(30 + 0.5 * 60) / 1.5, (0.5 * 60 + 90) / 1.5]])
    # row-stochastic: constant image stays constant under both filters
    const = np.full((11, 13), 77.0)
    assert np.allclose(resize_bilinear(const, 7, 19), 77.0)
    assert np.allclose(resize_area(const, 7, 19), 77.0)


def test_connected_components_raises_on_non_convergence(spark):
    import pytest as _pytest

    # a 6-hop path graph cannot reach the min-label fixpoint in 1 round
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], ["x", "y"]
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(pairs, max_iterations=1)
    # and converges fine with headroom
    labels = {r["node"]: r["comp"]
              for r in DD.connected_components(pairs).collect()}
    assert set(labels.values()) == {0}


def test_with_confidence_on_staged_and_checkpointed_paths(spark, tmp_path):
    """The staged path carries confidence as a per-page struct computed
    at the page grain (partial aggregation) and folded after the doc
    shuffle — output must equal the fused path's ConfidenceReport."""
    from high_performance_docling_spark.corpus import GenConfig
    from high_performance_docling_spark.pipeline import (
        docs_dataframe,
        extract_spans,
    )

    cfg = GenConfig(seed=17, n_docs=6, ocr_frac=0.25, keep_empty_clusters=True)
    docs = docs_dataframe(spark, cfg, num_partitions=2)

    def norm(rows):
        out = {}
        for r in rows:
            c = r["confidence"]
            out[r["doc_id"]] = (
                [s.asDict() for s in r["spans"]],
                (c["mean_score"], c["low_score"], c["mean_grade"],
                 c["low_grade"], tuple(p.asDict().items() for p in c["pages"])),
            )
        return out

    fused = norm(extract_spans(spark, docs, cfg, with_confidence=True).collect())
    staged = norm(extract_spans(spark, docs, cfg, mode="staged",
                                with_confidence=True).collect())
    assert staged == fused
    ckpt = norm(extract_spans(spark, docs, cfg,
                              checkpoint_dir=str(tmp_path / "c"),
                              with_confidence=True).collect())
    assert ckpt == fused


def test_star_cc_equals_label_propagation_on_pair_graph(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fp = DD.simhash(docs, bits=16)
    pairs = DD.simhash_band_pairs(fp, bits=16, bands=4, max_hamming=3)
    a = {(r["node"], r["comp"])
         for r in DD.connected_components(pairs).collect()}
    b = {(r["node"], r["comp"])
         for r in DD.connected_components_star(pairs).collect()}
    assert a == b and len(a) > 100


def test_star_cc_converges_on_long_chain_where_propagation_cannot(spark):
    """A 300-hop path needs 299 min-label rounds (connected_components
    raises at its 25-round budget) but O(log n) star alternations."""
    import pytest as _pytest

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], ["x", "y"]
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        DD.connected_components(path)
    labels = {r["node"]: r["comp"]
              for r in DD.connected_components_star(path, max_iterations=15).collect()}
    assert set(labels.values()) == {0} and len(labels) == 301


def test_scrub_pii_patterns(spark):
    from high_performance_docling_spark.operators.cleaning import scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@sub.example.org and ip 192.168.1.200 now"),
         (2, "tel 415-555-0142 ok but version 1.2.3 and year 2024 stay"),
         (3, "no pii here at all")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["clean_text"] for r in scrub_pii(df).collect()}
    assert got[1] == "mail <EMAIL> and ip <IP> now"
    assert got[2] == "tel <PHONE> ok but version 1.2.3 and year 2024 stay"
    assert got[3] == "no pii here at all"


def test_decontaminate_flags_only_overlapping_docs(spark):
    from high_performance_docling_spark.operators.cleaning import decontaminate

    words = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, words),                                  # shares a 13-gram
         (2, " ".join(f"x{i}" for i in range(30)))],  # disjoint vocab
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(99, " ".join(f"w{i}" for i in range(5, 25)))], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in decontaminate(docs, bench, n=13).collect()}
    assert got[1] == (8, 1)   # 20-token window: 8 13-grams
    assert got[2] == (0, 0)


def test_duplicate_substring_stats_island_merging(spark):
    """Crafted docs: a 25-token block repeated in two docs yields SIX
    duplicated 20-token windows each that must merge into ONE span of 25
    tokens; a doc with no repeats reports zeros."""
    block = " ".join(f"dup{i}" for i in range(25))
    uniq1 = " ".join(f"u{i}" for i in range(30))
    uniq2 = " ".join(f"v{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, uniq1 + " " + block),
         (2, block + " " + uniq2),
         (3, " ".join(f"w{i}" for i in range(40)))],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"], r["dup_frac"])
           for r in DD.duplicate_substring_stats(docs, min_tokens=20).collect()}
    assert got[1] == (1, 25, round(25 / 55, 4))
    assert got[2] == (1, 25, round(25 / 55, 4))
    assert got[3] == (0, 0, 0.0)
