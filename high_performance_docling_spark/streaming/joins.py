"""Stream-stream interval join: click -> purchase attribution.

The one Structured Streaming surface the other modules don't cover:
joining two UNBOUNDED sides. Spark buffers both sides in state and
needs (a) watermarks on both event times and (b) a time-bound join
condition — together they let it evict state once a click can no
longer find a matching purchase (state ~ watermark horizon x arrival
rate, not stream length).

Attribution semantics: a purchase joins every click by the same user
in the preceding attribution window (inner join; the batch analogue is
the identical interval self-join, asserted equal in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .windows import EVENTS_SCHEMA


def _typed(events: DataFrame, etype: str, prefix: str) -> DataFrame:
    return (
        events.filter(F.col("event_type") == etype)
        .select(
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("event_id").alias(f"{prefix}_id"),
            F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
            F.col("value").alias(f"{prefix}_value"),
        )
    )


def attribution_join(
    clicks: DataFrame, purchases: DataFrame, *, window: str = "30 minutes"
) -> DataFrame:
    """(click, purchase) pairs where the purchase happened within
    `window` AFTER the click by the same user. Works for both batch
    and streaming inputs — the condition is the state-eviction bound
    in streaming and just a predicate in batch."""
    return clicks.join(
        purchases,
        F.expr(
            f"c_user = p_user AND p_ts >= c_ts AND "
            f"p_ts <= c_ts + interval {window}"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("c_ts").alias("click_ts"),
        F.col("p_ts").alias("purchase_ts"),
        F.col("p_value").alias("purchase_value"),
    )


def stream_attribution(
    spark: SparkSession, source_dir: str, *,
    window: str = "30 minutes", watermark: str = "1 hour",
) -> DataFrame:
    """readStream x2 over the same event feed -> watermarked
    stream-stream interval join. Both sides carry a watermark so the
    join state is bounded: a buffered click is dropped once the
    purchase-side watermark passes click_ts + window."""
    def side(etype: str, prefix: str) -> DataFrame:
        ev = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", "4")
            .parquet(source_dir)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        return _typed(ev, etype, prefix).withWatermark(
            f"{prefix}_ts", watermark
        )

    return attribution_join(
        side("click", "c"), side("purchase", "p"), window=window
    )
