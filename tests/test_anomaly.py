"""MAD robust outlier detection (operators/anomaly.py) pinned against
a pure-Python median/MAD reference, including the robustness property
that motivates MAD over stddev. The registry entry (anomaly_mad) is
additionally cross-checked against the DuckDB oracle."""

from __future__ import annotations

import statistics

from high_performance_docling_spark.operators import anomaly as AN


def _py_outliers(rows, threshold=3.5):
    by_g: dict[str, list] = {}
    for _, g, v in rows:
        by_g.setdefault(g, []).append(v)
    out = []
    for rid, g, v in rows:
        vals = by_g[g]
        med = round(statistics.median(vals), 6)
        mad = round(
            statistics.median([abs(round(x - med, 6)) for x in vals]), 6
        )
        if mad == 0:
            continue
        score = round(0.6745 * round(v - med, 6) / mad, 6)
        if abs(score) > threshold:
            out.append((rid, g, score))
    return sorted(out)


def test_mad_outliers_match_python_reference(spark):
    rows = [(i, "a", float(v)) for i, v in enumerate(
        [10, 11, 9, 10, 12, 10, 11, 9, 10, 500]  # one gross outlier
    )] + [(100 + i, "b", float(v)) for i, v in enumerate(
        [1, 2, 1, 2, 1, 2, 1, 2, -300]
    )]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    got = sorted(
        (r["event_id"], r["event_type"], r["score"])
        for r in AN.mad_outliers(df).collect()
    )
    assert got == _py_outliers(rows)
    # exactly the two planted gross outliers
    assert [g[0] for g in got] == [9, 108]


def test_mad_is_robust_where_stddev_is_not(spark):
    # the 500 outlier inflates stddev so much that a plain 3-sigma rule
    # misses it barely or flags nothing else; MAD flags it decisively
    vals = [10.0, 11.0, 9.0, 10.0, 12.0, 10.0, 11.0, 9.0, 10.0, 500.0]
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    got = AN.mad_outliers(df).collect()
    assert len(got) == 1 and got[0]["event_id"] == 9
    assert abs(got[0]["score"]) > 100  # decisive, not marginal


def test_mad_zero_group_is_skipped(spark):
    rows = [(i, "c", 5.0) for i in range(9)] + [(9, "c", 6.0)]
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    # MAD = 0 (median of deviations is 0) -> group skipped entirely
    assert AN.mad_outliers(df).collect() == []
