#!/usr/bin/env python3
"""spark-submit entry point for pretraining-corpus preparation: raw
document table → quality gate → PII scrub → decontamination → exact
dedup → split → chunk → sequence-pack → sharded parquet, via
operators.pretrain.prepare_pretrain_corpus (every stage is an
individually-oracled operator).

Cluster usage:

    spark-submit --py-files dist/hpd_spark.zip jobs/pretrain_corpus_job.py \
        --docs      s3://corpus/documents/ \
        --benchmark s3://corpus/benchmarks/ \
        --output    s3://corpus/pretrain/ \
        --shards 4096

Output layout: <output>/chunks partitioned by split (train/val/test)
in --shards doc-keyed shards, <output>/documents (kept docs + split),
<output>/audit (per-input-document gate verdicts — why every dropped
doc was dropped).

Local smoke:
    python jobs/pretrain_corpus_job.py \
        --docs /root/testdata/sf0.001/documents.parquet --output /tmp/pt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description="documents → packed pretraining corpus")
    ap.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--benchmark", default=None,
                    help="benchmark parquet for 13-gram decontamination")
    ap.add_argument("--output", required=True)
    ap.add_argument("--chunk-size", type=int, default=128)
    ap.add_argument("--overlap", type=int, default=32)
    ap.add_argument("--pack-capacity", type=int, default=256)
    ap.add_argument("--shards", type=int, default=None,
                    help="output shard count (doc-keyed repartition)")
    args = ap.parse_args()

    from high_performance_docling_spark.operators.pretrain import (
        prepare_pretrain_corpus,
    )
    from high_performance_docling_spark.pipeline import get_spark

    spark = get_spark("pretrain-corpus-job")
    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    out = prepare_pretrain_corpus(
        docs, bench, chunk_size=args.chunk_size, overlap=args.overlap,
        pack_capacity=args.pack_capacity,
    )
    chunks = out["chunks"]
    if args.shards:
        chunks = chunks.repartition(args.shards, "doc_id")
    chunks.write.mode("overwrite").partitionBy("split").parquet(
        os.path.join(args.output, "chunks"))
    out["documents"].write.mode("overwrite").parquet(
        os.path.join(args.output, "documents"))
    out["audit"].write.mode("overwrite").parquet(
        os.path.join(args.output, "audit"))
    n_in = docs.count()
    n_kept = spark.read.parquet(os.path.join(args.output, "documents")).count()
    n_chunks = spark.read.parquet(os.path.join(args.output, "chunks")).count()
    print(f"pretrain corpus: {n_in} docs in -> {n_kept} kept -> "
          f"{n_chunks} packed chunks -> {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
