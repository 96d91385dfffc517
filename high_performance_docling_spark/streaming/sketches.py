"""Streaming HyperLogLog: distinct-count registers maintained as a
watermarked windowed MAX aggregation.

Chained aggregations are unsupported in Structured Streaming, so the
stream maintains only the REGISTER table — groupBy(window, group, reg)
max(rho), a standard mergeable windowed agg whose state is bounded at
<= 64 registers per (window, group) regardless of event rate (the
whole point of the sketch: state size is the sketch size, not the
distinct count). Finalization (registers → estimate) is a cheap
batch-side fold over those <= 64 rows per key, shared verbatim with
the batch query via operators/sketches.hll_estimate_from_registers —
run it on the sink table, in foreachBatch, or at read time.

Because the register max is commutative/associative/idempotent and the
hash deterministic, the streamed registers are BYTE-IDENTICAL to a
batch computation over the same files, independent of micro-batch
boundaries or arrival order (asserted in tests/test_streaming.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.sketches import hll_reg_rho
from .windows import EVENTS_SCHEMA


def stream_hll_registers(
    spark: SparkSession, source_dir: str, window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """readStream(parquet) → watermark → per-(window, event_type,
    register) max(rho). Late rows beyond the watermark drop, bounding
    state at 64 registers per open (window, event_type)."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    reg, rho = hll_reg_rho(F.col("user_id"))
    return (
        events.withWatermark("ts", watermark)
        .select("ts", "event_type", reg, rho)
        .groupBy(F.window("ts", window).alias("w"), "event_type", "reg")
        .agg(F.max("rho").alias("mx"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "reg", "mx"
        )
    )


def stream_cms_counters(
    spark: SparkSession, source_dir: str, window: str = "1 hour",
    watermark: str = "30 minutes", d: int = 4, w: int = 256,
) -> DataFrame:
    """Streaming count-min sketch: per-(window, row, bucket) COUNTER
    maintenance. Unlike the HLL's max, a counter SUM is not
    redelivery-idempotent, so the stream first deduplicates event_ids
    within the watermark (dropDuplicatesWithinWatermark — bounded
    state) and only then explodes each event into its d (row, bucket)
    cells and counts. State stays <= d*w cells per open (window)
    regardless of event rate; estimates finalize batch-side exactly
    like the batch cms_heavy_hitters query (same cms_bucket hash, so
    streamed counters == batch counters byte-for-byte on a deduped
    feed — asserted in tests)."""
    from ..operators.sketches import cms_bucket

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    cells = deduped.select(
        "ts",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("row"),
                    cms_bucket(F.col("user_id"), i, w).alias("bucket"),
                )
                for i in range(d)
            ])
        ).alias("rb"),
    )
    return (
        cells.groupBy(
            F.window("ts", window).alias("wd"), "rb.row", "rb.bucket"
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            F.col("wd.start").alias("window_start"), "row", "bucket", "c"
        )
    )
