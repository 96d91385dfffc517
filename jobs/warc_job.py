#!/usr/bin/env python3
"""spark-submit entry point for crawl-archive ingestion: WARC segments
(Common Crawl layout — plain or one-gzip-member-per-record) → HTTP
response fan-out → format-sniffing extraction (HTML boilerplate strip /
PDF parser incl. 1.5+ xref streams) → span table.

Cluster usage:

    python scripts/build_pyfiles.py                     # → dist/hpd_spark.zip
    spark-submit \
        --py-files dist/hpd_spark.zip \
        jobs/warc_job.py \
        --warc   s3://crawl/segments/ \
        --output s3://corpus/spans/ \
        --streaming --checkpoint-dir s3://corpus/warc_ckpt/ --idempotent

Batch mode processes the segment directory once (one task per archive —
crawl parallelism = segment count); --record-grain switches batch mode
to the mega-archive path: a streaming CDX index pass fans every archive
out to (offset, length) record rows fetched via ranged reads, so a
multi-GB segment spreads across the cluster instead of one heavy row
(use it whenever segments approach executor memory or the 2 GiB binary
ceiling); --streaming tails it with an
availableNow trigger so newly delivered segments become micro-batches,
and --idempotent commits each batch through the replace-by-batch sink
(iceberg.merge_commit) so retries converge. Read an idempotent output
back with iceberg.read_committed.

Local smoke (build a fixture with kernels.warc.build_warc):
    python jobs/warc_job.py --warc /tmp/crawl --output /tmp/spans
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description="WARC archives → ordered spans")
    ap.add_argument("--warc", required=True,
                    help="directory of .warc / .warc.gz segment files")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--streaming", action="store_true",
                    help="tail the segment dir as a stream (availableNow)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="stream checkpoint location (required w/ --streaming)")
    ap.add_argument("--idempotent", action="store_true",
                    help="replace-by-batch commit (streaming mode)")
    ap.add_argument("--record-grain", action="store_true",
                    help="mega-archive path: CDX index + ranged reads, "
                         "no task ever holds a whole archive (batch mode)")
    ap.add_argument("--record-partitions", type=int, default=None,
                    help="fetch-stage parallelism for --record-grain")
    args = ap.parse_args()

    from high_performance_docling_spark.pipeline import get_spark
    from high_performance_docling_spark.sources import (
        extract_fetched_documents,
        extract_warc_documents,
        read_warc,
        read_warc_records,
    )

    spark = get_spark("warc-job")
    if args.streaming:
        if not args.checkpoint_dir:
            ap.error("--streaming requires --checkpoint-dir")
        from high_performance_docling_spark.streaming.extract import (
            stream_extract_warc,
        )

        q = stream_extract_warc(
            spark, args.warc, args.output, args.checkpoint_dir,
            idempotent=args.idempotent,
        )
        q.awaitTermination()
    elif args.record_grain:
        docs = read_warc_records(spark, args.warc,
                                 num_partitions=args.record_partitions)
        out = extract_fetched_documents(docs)
        out.write.mode("overwrite").parquet(args.output)
    else:
        out = extract_warc_documents(read_warc(spark, args.warc))
        out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
