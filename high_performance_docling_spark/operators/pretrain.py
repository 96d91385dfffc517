"""End-to-end pretraining-corpus preparation — the composition that
turns a raw document table into training-ready packed sequences, wiring
the individually-oracled operators in the order a production pipeline
runs them:

    quality gate (Gopher rules) → PII scrub → benchmark decontamination
    → exact dedup [→ near dedup] [→ LM perplexity gate]
    → train/val/test split → chunk → sequence-pack

Every stage is one of the tested operators (text_analysis.gopher_quality,
cleaning.scrub_pii / decontaminate, dedup.exact_duplicates,
chunking.chunk_documents / pack_chunks, the md5 98/1/1 split), so the
composition inherits their scale shapes: pure projections + hash
aggregations + broadcast joins; the only corpus-keyed shuffles are the
dedup groupBy and the packing's per-bucket window. Deterministic
throughout — rerunning on a grown corpus never flips earlier split or
keep decisions (md5-keyed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .chunking import bucket_of, chunk_documents, pack_chunks
from .cleaning import decontaminate, scrub_pii
from .dedup import exact_duplicates
from .text_analysis import gopher_quality


def near_duplicate_ids(docs: DataFrame, max_hamming: int = 1) -> DataFrame:
    """(doc_id, kept_by) rows to DROP under near-dedup: SimHash pair
    graph → large-star/small-star connected components → keep the best
    member per cluster (highest mean token length, ties to lowest id),
    drop the rest. ``kept_by`` names the surviving representative of the
    dropped doc's cluster — the audit trail for WHY each near-duplicate
    was dropped and which document stands in for it. Same composition as
    the oracled dedup_representatives query; every stage is a banded
    equi-join / keyed shuffle (the kept_by first() rides the same
    per-component window as the rank)."""
    from pyspark.sql import Window as W

    from . import dedup as DD

    pairs = DD.simhash_band_pairs(DD.simhash(docs, bits=16),
                                  max_hamming=max_hamming)
    comps = DD.connected_components_star(pairs)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    q = docs.select(
        F.col("doc_id").alias("node"),
        F.round(F.length("text") / F.size(toks), 4).alias("mean_tok_len"),
    )
    member = q.join(comps, "node")  # only docs IN a duplicate cluster
    wr = W.partitionBy("comp").orderBy(F.desc("mean_tok_len"), F.asc("node"))
    return (
        member.withColumn("rk", F.row_number().over(wr))
        .withColumn("kept_by", F.first("node").over(wr))
        .filter(F.col("rk") > 1)
        .select(F.col("node").alias("doc_id"), "kept_by")
    )


def prepare_pretrain_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    chunk_size: int = 128,
    overlap: int = 32,
    pack_capacity: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_dedup: bool = False,
    max_ppl: float | None = None,
    lm: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Raw (doc_id, text) table → {"documents": kept docs with split,
    "chunks": packed chunk rows, "audit": per-stage keep flags}.

    ``audit`` carries one row per input document with every gate's
    verdict (gopher_pass, contaminated, is_duplicate, is_near_duplicate,
    split) so drops are explainable — the operational requirement for
    any filter that deletes training data.

    ``near_dedup=True`` adds the SimHash→components→representatives
    pass after exact dedup (near_duplicate_ids) — the fuzzy-duplicate
    layer most pretraining corpora need on top of exact hashing.

    ``max_ppl`` adds the CCNet-style LM quality gate (lm_score): drop
    documents whose bigram-LM perplexity over the scrubbed text exceeds
    the threshold. Pass a frozen ``lm`` triple (train_bigram_lm on a
    trusted partition) for append-stable decisions; with ``lm=None``
    the model is self-trained on this corpus, so scores are
    corpus-relative (an outlier detector, not a stable gate — documents
    can flip as the corpus grows).
    """
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))

    quality = gopher_quality(base).select("doc_id", "gopher_pass")

    scrubbed = scrub_pii(base).select("doc_id", "text", "clean_text")

    if benchmark is not None:
        contam = decontaminate(
            scrubbed.select("doc_id", F.col("clean_text").alias("text")),
            benchmark,
        ).select("doc_id", "contaminated")
    else:
        contam = base.select("doc_id", F.lit(0).alias("contaminated"))

    # exact dedup on the SCRUBBED text (two redacted copies are still
    # duplicates); keep_id = min doc_id per content hash
    norm = F.md5(F.lower(F.trim(F.col("clean_text"))))
    hashed = scrubbed.withColumn("content_hash", norm)
    keep = exact_duplicates(
        scrubbed.select("doc_id", F.col("clean_text").alias("text"))
    ).select("content_hash", "keep_id")
    deduped = hashed.join(keep, "content_hash").withColumn(
        "is_duplicate", (F.col("doc_id") != F.col("keep_id")).cast("int")
    )

    if near_dedup:
        near_ids = near_duplicate_ids(
            scrubbed.select("doc_id", F.col("clean_text").alias("text"))
        ).select(
            "doc_id",
            F.lit(1).alias("is_near_duplicate"),
            F.col("kept_by").alias("near_dup_kept_by"),
        )
        deduped = deduped.join(near_ids, "doc_id", "left").withColumn(
            "is_near_duplicate", F.coalesce("is_near_duplicate", F.lit(0))
        )
    else:
        deduped = deduped.withColumn(
            "is_near_duplicate", F.lit(0)
        ).withColumn("near_dup_kept_by", F.lit(None).cast("string"))

    if max_ppl is not None:
        from .lm_score import score_documents

        ppl = score_documents(
            scrubbed.select("doc_id", F.col("clean_text").alias("text")),
            lm=lm,
        ).select(
            "doc_id", "ppl",
            (F.col("ppl") <= F.lit(float(max_ppl))).alias("ppl_pass"),
        )
    else:
        ppl = base.select(
            "doc_id",
            F.lit(None).cast("double").alias("ppl"),
            F.lit(True).alias("ppl_pass"),
        )

    b = bucket_of(F.col("doc_id"), 100)
    split = F.when(b < 98, "train").when(b < 99, "val").otherwise("test")

    # The audit names WHICH representative survived for every dropped
    # duplicate (dup_kept_by = exact-dedup keep_id; near_dup_kept_by =
    # the quality-argmax representative of the SimHash cluster), so
    # keep/drop decisions stay explainable end-to-end.
    audit = (
        deduped.select(
            "doc_id", "is_duplicate", "is_near_duplicate",
            F.when(F.col("is_duplicate") == 1, F.col("keep_id"))
            .alias("dup_kept_by"),
            "near_dup_kept_by",
        )
        .join(quality, "doc_id")
        .join(contam, "doc_id")
        .join(ppl, "doc_id")
        .withColumn("split", split)
    )

    kept = (
        deduped.filter((F.col("is_duplicate") == 0)
                       & (F.col("is_near_duplicate") == 0))
        .join(quality.filter(F.col("gopher_pass")), "doc_id")
        .join(contam.filter(F.col("contaminated") == 0), "doc_id")
        .join(ppl.filter(F.col("ppl_pass")).select("doc_id"), "doc_id")
        .select("doc_id", F.col("clean_text").alias("text"))
        .withColumn("split", split)
    )

    # Pack PER SPLIT (group_cols): the split label joins onto the chunks
    # BEFORE packing so each split's prefix sum — and therefore every
    # bin — is assembled from that split's documents only. Packing after
    # the join with a single global cumsum would let one bin straddle
    # train/val/test: training sequences assembled by bin would leak
    # held-out tokens, and every split directory would hold torn bins.
    chunks = chunk_documents(
        kept.select("doc_id", "text"),
        chunk_size=chunk_size, overlap=overlap,
    ).join(kept.select("doc_id", "split"), "doc_id")
    packed = pack_chunks(chunks, capacity=pack_capacity,
                         group_cols=("split",))
    return {"documents": kept, "chunks": packed, "audit": audit}
