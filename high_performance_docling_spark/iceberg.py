"""Iceberg table-format sink/commit semantics (north-rule source/target).

The Iceberg runtime jar is a public Maven artifact
(org.apache.iceberg:iceberg-spark-runtime-3.5) that is NOT in this
sandbox and cannot be fetched (no network), so every entry point here
has two branches:

  - **Iceberg branch** (``iceberg_available``): DELETE-by-batch +
    append, keyed on a ``_commit_batch_id`` bookkeeping column — the
    exactly-once pattern for streaming commits into a v2 table. A
    retried micro-batch first deletes ALL rows of its previous attempt
    (including rows the corrected retry no longer contains) and then
    appends, so retry semantics are IDENTICAL to the parquet fallback's
    partition-dir overwrite: full replacement, and batches with multiple
    rows per doc_id (span-level frames) are fine — unlike a keyed MERGE
    INTO, which only upserts (stale rows survive) and raises a
    cardinality error on multi-row keys. A crash between the DELETE and
    the append still converges on re-run (the retry's DELETE is then a
    no-op). Exercised by tests/test_iceberg.py's catalog e2e test, which
    SKIPS without the runtime and runs fully when the jar is on the
    classpath (spark.jars.packages or --jars).
  - **Parquet fallback** (always testable): the idempotent-foreachBatch
    pattern — each micro-batch overwrites its own ``batch_id=N``
    partition directory, so a retried batch REPLACES its previous
    attempt. Semantically equivalent commit idempotence, asserted in
    tests that run in this sandbox.

Checkpoint resume (north rule: "resumable from checkpoint") is the same
anti-join in both branches: pending = docs ⟕ done, keyed on doc_id —
an Iceberg target just makes the "done" side a snapshot-consistent scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sources import iceberg_available

__all__ = [
    "iceberg_available",
    "merge_commit",
    "read_committed",
    "resume_pending",
]


def merge_commit(batch_df: DataFrame, target: str, batch_id: int,
                 key: str = "doc_id") -> None:
    """Idempotently commit one (micro-)batch of span rows to ``target``.

    ``target`` is an Iceberg table name (no '/') or a parquet directory.
    Re-invoking with the same ``batch_id`` converges to the same table
    state — the exactly-once contract a restarted streaming query needs
    from its sink — and a retry with CORRECTED data fully replaces the
    failed attempt in BOTH branches (no stale rows, no duplicate keys;
    multiple rows per ``key`` within a batch are allowed). ``key`` is
    kept for API compatibility with resume_pending-based callers; commit
    identity is the batch, not the key.
    """
    spark = batch_df.sparkSession
    if "/" not in target and iceberg_available(spark):
        # replace-by-batch in ONE Iceberg snapshot commit (ADVICE r5):
        # writeTo().overwrite(condition) is REPLACE WHERE — it deletes
        # the previous attempt's rows (no-op on first run) and inserts
        # the tagged rows atomically, so a concurrent reader sees either
        # the old attempt or the new one, never the gap a separate
        # DELETE-then-append pair exposes between its two commits.
        # Pre-existing rows without the bookkeeping column read as NULL
        # and are never replaced.
        tagged = batch_df.withColumn(
            "_commit_batch_id", F.lit(int(batch_id)))
        try:
            cols = spark.table(target).columns
        except Exception:
            tagged.writeTo(target).create()  # first commit creates the table
            return
        if "_commit_batch_id" not in cols:
            spark.sql(f"ALTER TABLE {target} ADD COLUMN _commit_batch_id INT")
        tagged.writeTo(target).overwrite(
            F.col("_commit_batch_id") == int(batch_id))
        return
    # parquet fallback: one overwritten partition dir per batch — a retry
    # replaces its own output instead of appending a duplicate
    batch_df.write.mode("overwrite").parquet(f"{target}/batch_id={batch_id}")


def read_committed(spark: SparkSession, target: str) -> DataFrame:
    """Read everything committed to ``target`` (snapshot-consistent scan
    on Iceberg; recursive partition-dir read on the parquet fallback),
    WITHOUT the commit bookkeeping column."""
    if "/" not in target and iceberg_available(spark):
        return spark.read.format("iceberg").load(target).drop("_commit_batch_id")
    df = spark.read.option("basePath", target).parquet(f"{target}/batch_id=*")
    return df.drop("batch_id")


def resume_pending(docs_df: DataFrame, target: str,
                   key: str = "doc_id") -> DataFrame:
    """Checkpoint resume: the documents NOT yet present in ``target``
    (left-anti join on ``key``) — a killed job restarts here without
    reprocessing completed documents. At 100 TB both sides are
    hash-partitioned on doc_id, so this is one co-partitioned shuffle;
    with an Iceberg target the done-side scan prunes to the key column
    (column pruning pushes into the parquet/Iceberg reader)."""
    spark = docs_df.sparkSession
    try:
        done = read_committed(spark, target).select(key).distinct()
    except Exception:  # nothing committed yet
        return docs_df
    return docs_df.join(done, key, "left_anti")
