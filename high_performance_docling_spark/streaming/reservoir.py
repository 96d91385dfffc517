"""Custom stateful streaming operator: per-group weighted reservoir
sampling (Efraimidis–Spirakis top-k without replacement) under
applyInPandasWithState.

The batch `sample_weighted` query draws the k rows with the largest
u^(1/w) (log-space: ln(u)/w) in one TakeOrderedAndProject. The same
draw is ONLINE-MAINTAINABLE — the top-k of a union is the top-k of
(top-k(A) ∪ B) — so a stream keeps exactly k rows of state per group
and the final reservoir equals the batch sample over the same rows,
independent of micro-batch boundaries or arrival order.

Determinism does double duty here: u derives from a 52-bit md5 of the
row id, so (a) the stream's final reservoir is BYTE-IDENTICAL to the
batch top-k (asserted in tests/test_streaming_state.py), and (b)
at-least-once redelivery is absorbed — a redelivered row carries the
same es_key and dedups against the reservoir by id instead of winning
a second slot.

Emission contract (append mode): each micro-batch emits the group's
full current reservoir stamped with a monotone ``seq`` from state; the
consumer takes seq == max(seq) per group for the final sample. State is
exactly k rows per group — the sample size, not the stream size.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .windows import EVENTS_SCHEMA

RESERVOIR_K = 16

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("es_key", T.DoubleType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("event_ids", T.ArrayType(T.LongType()), True),
        T.StructField("es_keys", T.ArrayType(T.DoubleType()), True),
        T.StructField("weights", T.ArrayType(T.DoubleType()), True),
    ]
)


def es_weighted_key(
    id_col: Column, weight_col: Column, salt: str = "res:"
) -> Column:
    """ln(u)/w with u from a 52-bit md5 of the row id (exact in double)
    — the deterministic Efraimidis–Spirakis key shared by the batch
    reference and the streaming reservoir."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 13
            ),
            16, 10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 52))
    return F.log(u) / F.greatest(weight_col.cast("double"), F.lit(1e-9))


def _make_reservoir(k: int):
    def _reservoir(key, pdfs, state: GroupState):
        (event_type,) = key
        if state.exists:
            seq, ids, keys, ws = state.get
            cand = {
                int(i): (float(kk), float(w))
                for i, kk, w in zip(ids, keys, ws)
            }
        else:
            seq, cand = 0, {}
        for pdf in pdfs:
            for i, kk, w in zip(
                pdf["event_id"].astype("int64"),
                pdf["es_key"].astype(float),
                pdf["weight"].astype(float),
            ):
                # dedup by id: redelivery carries the identical es_key
                cand[int(i)] = (float(kk), float(w))
        top = sorted(cand.items(), key=lambda t: (-t[1][0], t[0]))[:k]
        seq += 1
        state.update(
            (
                seq,
                [i for i, _ in top],
                [v[0] for _, v in top],
                [v[1] for _, v in top],
            )
        )
        yield pd.DataFrame(
            {
                "event_type": event_type,
                "seq": seq,
                "event_id": [i for i, _ in top],
                "es_key": [v[0] for _, v in top],
                "weight": [v[1] for _, v in top],
            }
        )

    return _reservoir


def stream_weighted_reservoir(
    spark: SparkSession, source_dir: str, k: int = RESERVOIR_K
) -> DataFrame:
    """readStream(parquet) → per-event_type E-S reservoir of size k.
    The key is computed JVM-side (md5/conv/log column expressions);
    the stateful Python stage only maintains the k-row heap."""
    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )
    sel = events.select(
        "event_type",
        "event_id",
        F.col("value").cast("double").alias("weight"),
        es_weighted_key(F.col("event_id"), F.col("value")).alias("es_key"),
    )
    return sel.groupBy("event_type").applyInPandasWithState(
        _make_reservoir(k),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
