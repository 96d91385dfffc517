"""Corpus source/sink connectors.

Production target is an Iceberg table of interleaved documents (north
rule); the Iceberg runtime jars are not in this sandbox, so the connector
probes for the catalog and falls back to partitioned parquet with the
same schema and the same write layout (hash-bucketed by doc_id). Swap is
a config change, not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # py4j package traversal never raises — force a real classload
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Table")
        return True
    except Exception:
        return False


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read the docs table. ``location`` is either an Iceberg table name
    (catalog.db.table) or a parquet path."""
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_spans(
    df: DataFrame, location: str, partitions: int | None = None
) -> None:
    """Write the output span table. Iceberg table name → iceberg writer
    (append semantics, hidden partitioning); path → parquet."""
    if partitions:
        df = df.repartition(partitions, "doc_id")
    if "/" not in location and iceberg_available(df.sparkSession):
        df.writeTo(location).createOrReplace()
        return
    df.write.mode("overwrite").parquet(location)
