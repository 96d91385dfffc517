"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated fact-to-fact join
(documents ⋈ per-doc scores, lineitem ⋈ orders) is the shuffle on the
join key — every run re-hashes and re-ships the full fact table.
Writing both sides bucketed on that key (``bucketBy(n, key)`` +
``sortBy``) pins each row to a bucket by murmur3 hash at WRITE time, so
every later equi-join or groupBy on the key reads already-co-located
buckets and Catalyst drops the Exchange entirely: the join plans as a
zero-shuffle SortMergeJoin, the aggregation as a partial+final pair
with no network step. The shuffle is paid once, at ingest, and
amortized over every downstream query — the same reason the reference
pre-partitions its page store by document before the per-doc stages
(batch splitter seam, /root/reference/lambda_preprocessor.py:47-58).

Sandbox note: bucket metadata lives in the session catalog (in-memory
here; a metastore in production), so ``write_bucketed`` registers a
table rather than writing a bare path. ``tests/test_plans.py`` pins the
no-Exchange join and no-Exchange aggregation shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and bucket-sorted) on
    ``keys``. One shuffle-equivalent pass now; zero shuffles for every
    later join/groupBy on ``keys``.

    ``num_buckets`` is the lasting parallelism of the table — at 100 TB
    choose it so one bucket fits an executor (thousands of buckets),
    and keep it IDENTICAL across the tables that will join, or the
    co-location is void and Spark re-shuffles one side.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    w = w.sortBy(*(sort_cols or keys))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket keys. With
    both sides bucketed identically this plans as a SortMergeJoin with
    NO Exchange on either side (pinned in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
