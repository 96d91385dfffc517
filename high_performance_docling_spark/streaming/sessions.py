"""Custom stateful streaming operator: per-user sessionization.

Demonstrates the applyInPandasWithState pattern (the Spark surface for
operators that need explicit keyed state — SURVEY.md §2.9 / task brief
"custom stateful operators"): per user_id, events accumulate into an
open session; a gap > timeout closes it and EMITS the finished session.

Two flush strategies (``timeout``):
  - "none": sessions close only when a later event of the SAME user
    arrives past the gap — an idle user's last session never emits.
  - "event_time" (VERDICT r2 #8): watermark-driven eviction via
    GroupStateTimeout.EventTimeTimeout — after folding a batch the state
    schedules a timeout at (last_event + gap); when the GLOBAL watermark
    (driven by all users' events) passes it, Spark re-invokes the
    function with state.hasTimedOut and the idle session flushes. This
    is the production shape: bounded state, no key ever pins memory
    forever. (Processing-time timeouts are deliberately avoided: an
    idle-flush PT timeout keeps processAllAvailable's trigger loop busy
    forever in tests — see memory note — and ties semantics to wall
    clock instead of data.)

The watermark delay is 0 seconds, so stream results match the batch
reference exactly; a production job tolerating late data would set a
positive delay and accept late-event sessions merging server-side.
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


def _make_sessionize(event_time_timeout: bool):
    def _sessionize(key, pdfs, state: GroupState):
        """Fold this micro-batch's events into the open session; emit
        every session a gap closes; with the event-time timeout, also
        emit the open session when the watermark passes last + gap."""
        (user_id,) = key
        rows = []
        if event_time_timeout and state.hasTimedOut:
            if state.exists:
                start, last, n, total = state.get
                rows.append((user_id, start, last, n, round(total, 2)))
                state.remove()
            yield pd.DataFrame(
                rows, columns=["user_id", "session_start", "session_end",
                               "n_events", "total_value"],
            )
            return
        events: list[tuple[float, float]] = []
        for pdf in pdfs:
            events.extend(
                zip(pdf["epoch"].astype(float), pdf["value"].astype(float))
            )
        events.sort()

        start, last, n, total = state.get if state.exists else (None, None, 0, 0.0)
        for ts, value in events:
            if start is None:
                start, last, n, total = ts, ts, 1, value
            elif ts - last > SESSION_GAP_SECONDS:
                rows.append((user_id, start, last, n, round(total, 2)))
                start, last, n, total = ts, ts, 1, value
            else:
                # a late event from an earlier micro-batch must not move
                # the session boundaries backwards
                start, last = min(start, ts), max(last, ts)
                n, total = n + 1, total + value
        if start is not None:
            state.update((start, last, n, total))
            if event_time_timeout:
                # evict when the watermark passes the session gap; the
                # frontier event that set `last` also drives the
                # watermark, so this timestamp is always in its future
                state.setTimeoutTimestamp(
                    int((last + SESSION_GAP_SECONDS) * 1000)
                )
        yield pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end",
                           "n_events", "total_value"],
        )

    return _sessionize


def stream_sessionize(
    spark, source_dir: str, timeout: str = "none"
) -> DataFrame:
    """readStream(parquet events) → stateful per-user sessionization.
    ``timeout``: "none" or "event_time" (watermark-driven idle flush)."""
    from .windows import EVENTS_SCHEMA

    if timeout not in ("none", "event_time"):
        raise ValueError(f"unknown timeout mode {timeout!r}")
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "4")
        .parquet(source_dir)
        .select(
            "user_id",
            F.col("ts").cast("timestamp").alias("ts_ts"),
            F.col("ts").cast("timestamp").cast("double").alias("epoch"),
            "value",
        )
    )
    if timeout == "event_time":
        events = events.withWatermark("ts_ts", "0 seconds")
        mode = GroupStateTimeout.EventTimeTimeout
    else:
        mode = GroupStateTimeout.NoTimeout
    return events.groupBy("user_id").applyInPandasWithState(
        _make_sessionize(timeout == "event_time"),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        mode,
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
