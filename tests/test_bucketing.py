"""Bucketed-table co-location: the write-once-shuffle-never pattern.

Pins the physical plans: a join of two same-bucketed tables on the
bucket key must contain NO Exchange (the shuffle was paid at write
time), and a groupBy on the bucket key must likewise skip the
exchange. A non-bucketed control asserts the mechanism (the Exchange
reappears), so the no-Exchange assertions can't pass vacuously.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from high_performance_docling_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").alias("n_chars")
    )
    scores = docs.select(
        "doc_id", (F.crc32(F.col("doc_id").cast("string")) % 100).alias("score")
    )
    for name, df in [("b_docs", docs), ("b_scores", scores)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed(df, name, ["doc_id"], num_buckets=8,
                       path=str(base / name))
    yield "b_docs", "b_scores"
    for name in ("b_docs", "b_scores"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables, no_broadcast):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["doc_id"])
    p = _plan(joined)
    assert "SortMergeJoin" in p
    assert "Exchange" not in p  # the whole point: no shuffle on either side
    n_docs = spark.table(left).count()
    assert joined.count() == n_docs


def test_unbucketed_control_join_shuffles(spark, bucketed_tables, no_broadcast):
    # Control: same join against a plain (non-bucketed) copy MUST plan an
    # Exchange — proves the assertion above isn't vacuous.
    left, _ = bucketed_tables
    plain = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.length("text").alias("n2"))
    )
    p = _plan(spark.table(left).join(plain, ["doc_id"]))
    assert "Exchange" in p


def test_bucketed_groupby_is_shuffle_free(spark, bucketed_tables):
    left, _ = bucketed_tables
    agg = spark.table(left).groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    p = _plan(agg)
    assert "Exchange" not in p


def test_bucketed_roundtrip_values(spark, bucketed_tables):
    # Bucketing is a layout property, not a semantic one: values survive.
    left, _ = bucketed_tables
    orig = dict(
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.length("text").alias("n_chars"))
        .collect()
    )
    got = dict(spark.table(left).collect())
    assert got == orig
