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
