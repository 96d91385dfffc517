"""Watermarked windowed aggregation over a parquet-backed event stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_windowed_counts(
    spark: SparkSession, source_dir: str, window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """readStream(parquet) → watermark → tumbling-window counts per
    event_type. Late rows beyond the watermark are dropped — state stays
    bounded at any corpus rate."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_stream_once(agg: DataFrame, query_name: str = "stream_out") -> DataFrame:
    """Drive the streaming query to completion over the currently-available
    files (memory sink, complete mode) and return the result as a batch
    DataFrame — the local smoke harness for streaming operators."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.sql(f"SELECT * FROM {query_name}")


def stream_session_windows(
    spark: SparkSession, source_dir: str, gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """NATIVE session windows (F.session_window) — the built-in
    gap-merging aggregation, complementing sessions.py's
    applyInPandasWithState custom sessionizer: use the native form
    whenever plain per-session aggregates suffice (it keeps the whole
    operator JVM-side); the custom form exists for session logic the
    built-in can't express. State is bounded by the watermark: a
    session closes once no event can extend it."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events", "session_value",
        )
    )
