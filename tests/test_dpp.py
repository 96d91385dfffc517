"""Dynamic partition pruning evidence: joining a partitioned fact
table to a FILTERED dimension prunes fact partitions at runtime — the
fact scan's PartitionFilters carry a dynamicpruning subquery instead
of reading every partition. This is the Catalyst behavior that makes
date-partitioned 100 TB fact scans cheap when the dimension filter
only selects a few partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    fact_dir = str(tmp_path / "events_by_type")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.write.partitionBy("event_type").parquet(fact_dir)

    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("click", "interaction"), ("view", "interaction"),
         ("purchase", "conversion"), ("signup", "conversion"),
         ("error", "ops")],
        ["event_type", "family"],
    )
    joined = fact.join(
        dim.filter(F.col("family") == "conversion"), "event_type"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan[:2000]
    # and the result really only contains the two pruned-in partitions
    types = {r["event_type"] for r in joined.select("event_type")
             .distinct().collect()}
    assert types == {"purchase", "signup"}
