"""Training-data chunking and sequence packing.

The two transforms every LLM pretraining pipeline runs after extraction:

  - chunk_documents: split each document into fixed-size token windows
    with overlap (stride = chunk_size - overlap). Pure JVM array ops —
    slice/sequence/posexplode — so a 100 TB corpus chunks in one narrow
    pass (the explode multiplies rows, never shuffles).
  - pack_chunks: assign chunks to fixed-capacity bins (sample packing)
    via a running token cumsum: bin = floor(cum_before / capacity).
    This is the scalable approximation of first-fit packing — exact
    first-fit-decreasing is inherently sequential; the cumsum variant
    wastes at most max_chunk/capacity per bin and is ONE window pass.
    At scale the window is per-partition (salt by hash(doc_id) //
    partition) instead of global; the global form here keeps the DuckDB
    oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_tokens): whitespace-token windows
    of ``chunk_size`` tokens every ``stride = chunk_size - overlap``.
    n_chunks = ceil(max(n_tokens - overlap, 1) / stride) — every token is
    covered, consecutive chunks share ``overlap`` tokens, short docs
    yield one chunk."""
    assert 0 <= overlap < chunk_size
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / stride).cast("int")
    ids = F.sequence(F.lit(0), n_chunks - 1)
    exploded = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"),
        F.explode(ids).alias("chunk_id"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return exploded.select(
        "doc_id", "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 256,
    order_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each chunk a ``bin_id`` by running-cumsum shelf packing in
    the deterministic (doc_id, chunk_id) order. Output adds bin_id; bin
    stats come from a groupBy on it."""
    w = W.orderBy(*order_cols).rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = F.sum(tokens_col).over(w)
    return chunks.withColumn(
        "bin_id", F.floor((cum - F.col(tokens_col)) / capacity).cast("long")
    )
