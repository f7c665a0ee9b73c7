"""Shared SparkSession for tests: one local JVM per pytest run."""

from __future__ import annotations

from metric_search_spark.session import build_session

_SPARK = None


def get_spark():
    global _SPARK
    if _SPARK is None:
        _SPARK = build_session(
            cpus=4,
            app_name="metric_search_spark-tests",
            shuffle_partitions=8,
            extra_conf={"spark.driver.memory": "4g"},
        )
    return _SPARK
