"""One-scan column profiler (operators/profiling.py): values pinned
against hand-computed stats on a fixture with nulls and duplicates;
single-aggregation plan shape pinned (exactly one scan of the input).
The registry entry (profile_documents) is additionally cross-checked
against the DuckDB oracle by scripts/verify_queries.py."""

from __future__ import annotations

from high_performance_docling_spark.operators import profiling as PF

ROWS = [
    (1, "alpha", None),
    (2, "beta", 10.5),
    (2, None, 10.5),
    (3, "alpha", -1.0),
    (None, "gamma", 99.0),
]


def test_profile_values(spark):
    df = spark.createDataFrame(ROWS, ["id", "name", "score"])
    got = {
        r["col_name"]: r
        for r in PF.profile_columns(df, ["id", "name", "score"]).collect()
    }
    assert set(got) == {"id", "name", "score"}
    assert all(r["n_rows"] == 5 for r in got.values())
    assert (got["id"]["n_nulls"], got["id"]["n_distinct"]) == (1, 3)
    assert (got["id"]["min_val"], got["id"]["max_val"]) == ("1", "3")
    assert (got["name"]["n_nulls"], got["name"]["n_distinct"]) == (1, 3)
    assert (got["name"]["min_val"], got["name"]["max_val"]) == (
        "alpha", "gamma",
    )
    # numeric min/max ordered numerically, not lexicographically
    assert (got["score"]["min_val"], got["score"]["max_val"]) == (
        "-1.0", "99.0",
    )
    assert got["score"]["n_nulls"] == 1 and got["score"]["n_distinct"] == 3


def test_profile_is_one_scan(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        PF.profile_columns(df, ["doc_id", "lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one scan feeding one (expanded) aggregation — no join, no union
    assert plan.count("Scan parquet") == 1
    assert "Union" not in plan and "Join" not in plan
