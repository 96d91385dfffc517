from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from high_performance_docling_spark.pipeline import get_spark

    spark = get_spark("pytest", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
