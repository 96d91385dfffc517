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
    wastes at most max_chunk/capacity per bin.

    The cumsum is a TWO-PHASE DISTRIBUTED PREFIX SUM, not a global
    window: chunks are bucketed by a portable md5 hash of doc_id, each
    bucket computes its local running cumsum in parallel (window
    partitioned by bucket), and the tiny per-bucket token totals
    (n_buckets rows) are expanded into exclusive prefix offsets with an
    explode+groupBy — so the plan contains NO single-partition exchange
    and the operator survives a 100x scale-up. The packing order is the
    deterministic total order (bucket, doc_id, chunk_id); a DuckDB
    oracle reproduces it exactly with one global window in that order.
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
    yield one chunk, and empty/whitespace-only docs yield NO chunks
    (F.split of '' is [''], which would otherwise count as one token)."""
    assert 0 <= overlap < chunk_size
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / stride).cast("int")
    ids = F.sequence(F.lit(0), n_chunks - 1)
    exploded = df.filter(n > 0).select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"),
        F.explode(ids).alias("chunk_id"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_id") * stride + 1, chunk_size)
    return exploded.select(
        "doc_id", "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )


def bucket_of(col, n_buckets: int):
    """Portable deterministic bucket: first 4 md5 hex chars as an int,
    mod ``n_buckets``. Spark conv(substring(md5(x),1,4),16,10) ==
    DuckDB ('0x' || substr(md5(x),1,4))::BIGINT, so oracles match
    byte-for-byte. Uniform by construction — no bucket skew."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(n_buckets)).cast("int")


def pack_chunks(
    chunks: DataFrame,
    capacity: int = 256,
    order_cols: tuple[str, str] = ("doc_id", "chunk_id"),
    tokens_col: str = "n_tokens",
    n_buckets: int = 32,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Assign each chunk a ``bin_id`` by running-cumsum shelf packing in
    the deterministic (bucket, *order_cols) order, where bucket is a
    portable md5 hash of ``order_cols[0]`` mod ``n_buckets``.

    Two-phase distributed prefix sum:
      1. local cumsum per bucket — window partitionBy(bucket), so every
         bucket's cumsum runs in its own task (hash exchange, never a
         single-partition exchange);
      2. exclusive prefix offsets across buckets — the n_buckets-row
         totals aggregate is expanded (each bucket's total explodes to
         every LATER bucket id: <= n_buckets^2/2 rows) and re-grouped,
         then broadcast-joined back. bin = floor((offset + local_cum -
         n_tokens) / capacity), identical to one global cumsum in the
         (bucket, *order_cols) order — bins spanning a bucket boundary
         come out exactly as the global form would produce them.

    ``group_cols`` packs each group INDEPENDENTLY (bin numbering and the
    prefix sum restart per group), identical to calling pack_chunks on
    each group's chunks separately — the split-aware mode a train/val/
    test pipeline needs so no bin ever mixes documents from two splits
    (a bin assembled across splits would leak val/test tokens into train
    sequences). Empty tuple = the original single-group behavior.

    Output adds bin_id; bin stats come from a groupBy on it."""
    gcols = list(group_cols)
    first = order_cols[0]
    ch = chunks.withColumn("_bucket", bucket_of(F.col(first), n_buckets))
    w = (
        W.partitionBy(*gcols, "_bucket")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ch = ch.withColumn("_cum_local", F.sum(tokens_col).over(w))
    totals = ch.groupBy(*gcols, "_bucket").agg(
        F.sum(tokens_col).alias("_btot"))
    offsets = (
        totals.filter(F.col("_bucket") < n_buckets - 1)
        .select(
            *gcols,
            F.explode(
                F.sequence(F.col("_bucket") + 1, F.lit(n_buckets - 1))
            ).alias("_bucket"),
            "_btot",
        )
        .groupBy(*gcols, "_bucket")
        .agg(F.sum("_btot").alias("_offset"))
    )
    cum_before = (
        F.coalesce(F.col("_offset"), F.lit(0))
        + F.col("_cum_local")
        - F.col(tokens_col)
    )
    return (
        ch.join(F.broadcast(offsets), [*gcols, "_bucket"], "left")
        .withColumn("bin_id", F.floor(cum_before / capacity).cast("long"))
        .drop("_bucket", "_cum_local", "_offset")
    )
