"""Stateful streaming sessionization: emitted (closed) sessions must
equal the batch reference minus each user's still-open final session."""

import shutil

from pyspark.sql import functions as F

from high_performance_docling_spark.streaming.sessions import (
    sessionize_batch_reference,
    stream_sessionize,
)

SF = "/root/testdata/sf0.001"


def test_stream_sessionize_emits_closed_sessions(spark, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    shutil.copy(f"{SF}/events.parquet", src / "part-0.parquet")

    out = stream_sessionize(spark, str(src))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    ref = sessionize_batch_reference(spark, str(src))
    # drop each user's final (still-open) session
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("session_start"))
    closed = (
        ref.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") > 1)
        .drop("rk")
    )
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["total_value"])
        for r in closed.collect()
    }
    assert got == want
    assert len(got) > 50  # substantial session activity exercised
