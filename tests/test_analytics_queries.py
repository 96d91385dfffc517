"""Analytics-query invariants: retention-cohort semantics and the
shipping-priority (TPC-H Q3 shape) plan — broadcast dimension join +
predicates pushed into the parquet scans. Value-exactness vs DuckDB
is scripts/verify_queries.py's job."""

from __future__ import annotations

from high_performance_docling_spark.entry_queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_retention_cohort_invariants(spark):
    rows = QUERIES["retention_cohorts"](spark, SF).collect()
    assert rows
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["week_offset"])
        # week-0 retention is exactly 1.0 by construction: every user
        # is active in the week of their first event
        assert rs[0]["week_offset"] == 0
        assert rs[0]["retention"] == 1.0
        assert rs[0]["n_active"] == rs[0]["cohort_size"]
        for r in rs:
            assert 0 < r["n_active"] <= r["cohort_size"]
            assert 0.0 < r["retention"] <= 1.0
        # one cohort size per cohort
        assert len({r["cohort_size"] for r in rs}) == 1


def test_shipping_priority_plan_shape(spark):
    df = QUERIES["shipping_priority"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the customer dimension joins as a broadcast
    assert "BroadcastHashJoin" in plan
    # segment + date predicates reach the parquet scans
    assert "PushedFilters: [" in plan
    assert "c_mktsegment" in plan.split("PushedFilters")[1][:2000] or (
        "EqualTo(c_mktsegment,BUILDING)" in plan
    )
    rows = df.collect()
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_zorder_buckets_are_local_in_both_dims(spark):
    # top-4 z-bits carve the 256x256 grid into 16 quadrant cells of
    # 64x64: every bucket's bounding box must fit one — the 2-D
    # locality a 1-D sort can't give (a sort by x alone would span the
    # full y range in every file)
    rows = QUERIES["zorder_layout"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["max_x"] - r["min_x"] <= 63
        assert r["max_y"] - r["min_y"] <= 63
        assert r["n_rows"] > 0


def test_snapshot_diff_statuses_partition_the_keys(spark):
    rows = QUERIES["snapshot_diff"](spark, SF).collect()
    by_status: dict[str, set] = {}
    for r in rows:
        by_status.setdefault(r["status"], set()).add(r["doc_id"])
    assert set(by_status) == {"added", "removed", "changed"}
    # construction invariants: added = %10 docs kept by new filter;
    # removed = %7 docs present in old; changed = revised %5 survivors
    assert all(d % 10 == 0 and d % 7 != 0 for d in by_status["added"])
    assert all(d % 7 == 0 and d % 10 != 0 for d in by_status["removed"])
    assert all(
        d % 5 == 0 and d % 7 != 0 and d % 10 != 0
        for d in by_status["changed"]
    )
    # statuses are disjoint
    assert not (by_status["added"] & by_status["removed"])
    assert not (by_status["added"] & by_status["changed"])


def test_salted_join_is_row_identical_and_salts_the_exchange(spark):
    from pyspark.sql import functions as F

    from high_performance_docling_spark.operators.skew import salted_join

    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    plain = orders.join(cust, "c_custkey")
    salted = salted_join(orders, cust, "c_custkey", n_salts=8,
                         salt_source="o_orderkey")
    # row-identical result
    a = sorted(map(str, plain.select(sorted(plain.columns)).collect()))
    b = sorted(map(str, salted.select(sorted(plain.columns)).collect()))
    assert a == b
    # the join key is (key, salt): the exchange partitions on both
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan
    # deterministic replay: same salt assignment both times
    s1 = salted.select("c_custkey", "o_orderkey").collect()
    s2 = salted.select("c_custkey", "o_orderkey").collect()
    assert sorted(map(str, s1)) == sorted(map(str, s2))
