#!/usr/bin/env python3
"""spark-submit entry point for REAL-document ingestion: a (doc_id, url)
manifest → distributed fetch → format-sniffing extraction (PDF parser /
HTML boilerplate strip) → span table.

Cluster usage:

    python scripts/build_pyfiles.py                     # → dist/hpd_spark.zip
    spark-submit \
        --py-files dist/hpd_spark.zip \
        jobs/ingest_job.py \
        --manifest s3://corpus/manifest/ \
        --output   s3://corpus/spans/ \
        --streaming --checkpoint-dir s3://corpus/ingest_ckpt/

Batch mode runs the manifest once; --streaming tails the manifest
directory with an availableNow trigger (new files → new micro-batches),
exactly-once via the stream checkpoint. The HTTP fetch seam raises in
this sandbox (sources.fetch_documents real_http); production passes a
fetcher or enables real_http where requests is installed. The default
fetcher here is the deterministic fake (sha256-stream bytes), so a
sandbox smoke run produces 'error' rows — wire a real fetcher for
content.

Local smoke:
    python jobs/ingest_job.py --manifest /tmp/manifest --output /tmp/spans
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    ap = argparse.ArgumentParser(description="url manifest → ordered spans")
    ap.add_argument("--manifest", required=True,
                    help="parquet dir of (doc_id string, url string)")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument("--streaming", action="store_true",
                    help="tail the manifest dir as a stream (availableNow)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="stream checkpoint location (required w/ --streaming)")
    ap.add_argument("--real-http", action="store_true",
                    help="use the real HTTP fetch seam (needs requests)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="repartition the manifest (fetch parallelism)")
    args = ap.parse_args()

    from high_performance_docling_spark.pipeline import get_spark
    from high_performance_docling_spark.sources import (
        extract_fetched_documents,
        fetch_documents,
    )

    spark = get_spark("ingest-job")
    if args.streaming:
        if not args.checkpoint_dir:
            ap.error("--streaming requires --checkpoint-dir")
        from high_performance_docling_spark.streaming.extract import (
            stream_extract_fetched,
        )

        q = stream_extract_fetched(
            spark, args.manifest, args.output, args.checkpoint_dir,
            real_http=args.real_http,
        )
        q.awaitTermination()
    else:
        manifest = spark.read.parquet(args.manifest)
        if args.partitions:
            manifest = manifest.repartition(args.partitions)
        out = extract_fetched_documents(
            fetch_documents(manifest, real_http=args.real_http)
        )
        out.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
