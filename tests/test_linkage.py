"""Blocked record linkage (operators/linkage.py) pinned against a
pure-Python reference; the registry entries (fuzzy_name_pairs,
fuzzy_match_parts) are additionally cross-checked against DuckDB
oracles by scripts/verify_queries.py."""

from __future__ import annotations

import pytest

from high_performance_docling_spark.operators import linkage as LK

CATALOG = [
    "red widget", "red ring", "blue bolt", "blue ring",
    "small ring", "small rod", "green anvil",
]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_blocked_pairs_match_python_reference(spark):
    df = spark.createDataFrame([(n,) for n in CATALOG], ["p_name"])
    got = {
        (r["name_a"], r["name_b"]): r["dist"]
        for r in LK.blocked_name_pairs(df, max_dist=3).collect()
    }
    want = {}
    for a in CATALOG:
        for b in CATALOG:
            if a < b and a.split()[0] == b.split()[0]:
                d = _lev(a, b)
                if d <= 3:
                    want[(a, b)] = d
    assert got == want
    # sanity: the block boundary excludes cross-color pairs even when
    # close ("blue ring" vs "small ring" is out of scope by design)
    assert ("blue ring", "small ring") not in got


@pytest.mark.parametrize(
    "mention,expected",
    [
        ("red widgit", ("red widget", 1)),
        ("blu bolt", ("blue bolt", 1)),
        ("smal ring", ("small ring", 1)),
        ("greenanvil", ("green anvil", 1)),  # head-block pass only
        ("xyz nothing", None),  # beyond max_dist -> dropped
    ],
)
def test_resolve_mentions_cases(spark, mention, expected):
    cat = spark.createDataFrame([(n,) for n in CATALOG], ["p_name"])
    m = spark.createDataFrame([(mention,)], ["mention"])
    rows = LK.resolve_mentions(m, cat, max_dist=3).collect()
    if expected is None:
        assert rows == []
    else:
        assert len(rows) == 1
        assert (rows[0]["matched_name"], rows[0]["dist"]) == expected


def test_resolve_mentions_tie_breaks_lexicographically(spark):
    cat = spark.createDataFrame(
        [("red ring",), ("red rind",)], ["p_name"]
    )
    m = spark.createDataFrame([("red rin",)], ["mention"])
    rows = LK.resolve_mentions(m, cat, max_dist=3).collect()
    # both candidates at dist 1 -> lexicographically smaller name wins
    assert rows[0]["matched_name"] == "red rind"
