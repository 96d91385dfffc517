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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingles

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
