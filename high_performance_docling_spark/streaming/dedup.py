"""Streaming exact-dedup: exactly-once ingestion over a replayable feed.

A replayed/duplicated event feed (at-least-once upstream delivery) is
deduplicated with ``dropDuplicatesWithinWatermark`` — state is bounded by
the watermark horizon instead of growing with the stream (the difference
between this and plain dropDuplicates is what makes it viable at
100 TB/day ingest rates: keys older than the watermark are evicted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .windows import EVENTS_SCHEMA


def stream_dedup_events(
    spark: SparkSession, source_dir: str, watermark: str = "1 hour"
) -> DataFrame:
    """readStream(parquet) → watermark → drop duplicate event_ids seen
    within the watermark horizon."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_stream_append(df: DataFrame, query_name: str) -> DataFrame:
    """Drive an append-mode streaming query over the currently-available
    files (memory sink) and return the result as a batch DataFrame."""
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return df.sparkSession.sql(f"SELECT * FROM {query_name}")
