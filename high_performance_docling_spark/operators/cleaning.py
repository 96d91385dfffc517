"""Corpus-cleaning operators a pretraining pipeline runs after dedup.

  - scrub_pii: regex redaction of emails / IPv4s / long digit runs
    (phone-ish) — pure JVM regexp_replace chain, one narrow pass, no
    shuffle; patterns restricted to syntax Java regex and RE2 share so
    the DuckDB oracle replays them byte-for-byte.
  - decontaminate: benchmark n-gram decontamination (the public GPT-3 /
    FLAN recipe: a document is contaminated when it shares any 13-gram
    with an evaluation set). Shape at 100 TB: the benchmark side is tiny
    (eval sets are millions of shingles at most) → broadcast hash join
    against the corpus shingle explode; the corpus never shuffles.
  - decontaminate_bloom: the memory-bounded scale path — broadcast a
    Bloom filter's occupied bit positions instead of the shingle
    strings, screen via chained broadcast joins (no false negatives),
    exact-confirm only the survivors; per-doc false-positive accounting
    in the output. Deterministic md5 positions → oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _h56, shingles

# Order matters: emails contain dots/digits that the later patterns
# could otherwise chew on. Every pattern is Java-regex ∩ RE2 syntax.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # no \+? prefix: "\b\+?" only fires after a word char (there is no
    # boundary between whitespace and '+'), where the two engines would
    # then disagree with an oracle lacking it — international prefixes
    # need lookbehind and are out of scope
    (r"\b\d[\d().-]{7,}\d\b", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    """Add ``out_col`` = ``text_col`` with emails, IPv4 addresses and
    long digit runs replaced by typed redaction tokens."""
    col = F.col(text_col)
    for pattern, token in PII_PATTERNS:
        col = F.regexp_replace(col, pattern, token)
    return df.withColumn(out_col, col)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, contaminated): per document, how many distinct
    ``n``-gram shingles it shares with the benchmark set, and the
    drop flag (any overlap ⇒ contaminated — the conservative
    decontamination rule). Join the flag back (or left-anti on it) to
    filter the corpus; returning the flag keeps the operator auditable."""
    doc_sh = shingles(docs, id_col=id_col, text_col=text_col, n=n)
    bench_sh = (
        shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        # int (not boolean) so the driver's value-hash canonicalization
        # is engine-portable (bool wire formats were never exercised)
        (F.coalesce("n_hits", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


def bloom_positions(
    benchmark: DataFrame,
    n: int = 13,
    n_hashes: int = 3,
    n_bits: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Occupied bit positions of a Bloom filter over the benchmark's
    distinct ``n``-gram shingles: for every shingle and every seed
    ``i < n_hashes``, position ``h56_i(shingle) mod n_bits``. Returned
    as a DISTINCT single-column DataFrame of longs — the relational
    rendition of the bit array (at most ``min(n_bits, n_hashes·|B|)``
    rows, independent of shingle string length)."""
    bench_sh = (
        shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    arr = F.array(
        *[(_h56(F.col("shingle"), i) % n_bits) for i in range(n_hashes)]
    )
    return bench_sh.select(F.explode(arr).alias("pos")).distinct()


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    n_hashes: int = 3,
    n_bits: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-prefiltered benchmark decontamination — the memory-bounded
    scale path for :func:`decontaminate`.

    The exact recipe broadcasts the benchmark's shingle STRINGS (~80+
    bytes per 13-gram); at a large eval-suite union that broadcast is
    the limiting term. This variant broadcasts only the Bloom filter's
    occupied bit positions (8-byte longs, at most ``n_bits`` rows —
    fixed memory regardless of shingle length), screens every corpus
    shingle through ``n_hashes`` chained broadcast hash joins (a shingle
    survives iff ALL its positions are occupied — the Bloom membership
    test as relational algebra, no false negatives by construction),
    and confirms only the surviving sliver against the true shingle
    strings. Per document it reports both counts, so the false-positive
    overhead of the chosen (n_bits, n_hashes) is measurable in the
    output rather than assumed:

        (doc_id, n_bloom_hits, n_exact_hits, n_false_pos, contaminated)

    Everything is deterministic (md5-derived positions, no RNG), so the
    DuckDB oracle replays the identical filter bit-for-bit — the
    approximation lives in the algorithm, not the arithmetic.

    Scale shape at 100 TB: the corpus side never shuffles — the screen
    is ``n_hashes`` broadcast hash joins against the SAME position
    table, the confirm join touches only Bloom survivors, and the one
    shuffle is the final per-doc count aggregation (same as the exact
    path). Spark's own runtime-filter machinery (AQE bloom pruning)
    applies the identical idea to scan pruning; expressing it as
    operators keeps it plannable and oracle-checkable.
    """
    pos_tbl = bloom_positions(
        benchmark, n=n, n_hashes=n_hashes, n_bits=n_bits,
        id_col=id_col, text_col=text_col,
    )
    surv = shingles(docs, id_col=id_col, text_col=text_col, n=n)
    for i in range(n_hashes):
        surv = surv.withColumn(f"__p{i}", _h56(F.col("shingle"), i) % n_bits)
        surv = surv.join(
            F.broadcast(pos_tbl.select(F.col("pos").alias(f"__p{i}"))),
            f"__p{i}",
        )
    surv = surv.select("doc_id", "shingle")
    bloom_hits = surv.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bloom_hits")
    )
    bench_sh = (
        shingles(benchmark, id_col=id_col, text_col=text_col, n=n)
        .select("shingle")
        .distinct()
    )
    exact_hits = (
        surv.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_exact_hits"))
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return (
        ids.join(bloom_hits, "doc_id", "left")
        .join(exact_hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (
                F.coalesce("n_bloom_hits", F.lit(0))
                - F.coalesce("n_exact_hits", F.lit(0))
            ).alias("n_false_pos"),
            (F.coalesce("n_exact_hits", F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )
