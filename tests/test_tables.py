"""Table-IO seam tests (VERDICT r3 item 5): the Parquet branch of
``sources.tables`` is exercised directly — identifier routing, append vs
replace, the clear-error catalog path — and the Iceberg branch is a
skip-unless-runtime integration test, so it runs (not silently skips the
whole seam) the day an iceberg-spark-runtime jar appears on the classpath.

Reference parity: the reference persists its index/table state through its
own storage layer (storage.cpp); this seam is the Spark-native equivalent —
Iceberg row-level ops when available, plain Parquet plus the engine's LSM
delta log (streaming/incremental.py) otherwise.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from metric_search_spark.sources.tables import (
    _is_path,
    iceberg_available,
    read_table,
    write_table,
)
from tests.sparkutil import get_spark


def test_identifier_routing():
    """Paths and URIs route to Parquet; bare dotted names to the catalog."""
    assert _is_path("/tmp/t.parquet")
    assert _is_path("relative/dir")
    assert _is_path("s3://bucket/key")
    assert _is_path("file:///tmp/t")
    assert not _is_path("db.table")
    assert not _is_path("catalog.db.table")
    assert not _is_path("plain_table")


def test_parquet_roundtrip_append_and_overwrite():
    spark = get_spark()
    df = spark.range(5).withColumnRenamed("id", "k")
    with tempfile.TemporaryDirectory(prefix="msk_tbl_") as d:
        path = os.path.join(d, "t")
        write_table(df, path)  # default append creates
        assert read_table(spark, path).count() == 5
        write_table(df, path, mode="append")
        assert read_table(spark, path).count() == 10
        write_table(df, path, mode="overwrite")
        got = read_table(spark, path)
        assert got.count() == 5
        assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 3, 4]


def test_catalog_identifier_without_iceberg_is_a_clear_error():
    spark = get_spark()
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present — the error path can't trigger")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        read_table(spark, "db.missing")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_table(spark.range(1), "db.missing")


def test_iceberg_roundtrip_append_and_replace():
    """Runs only when a runtime jar is present (skip-unless-iceberg, checked
    at runtime so collecting this module never forces a session build): the
    catalog branch must round-trip append and createOrReplace through the
    same seam."""
    spark = get_spark()
    if not iceberg_available(spark):
        pytest.skip(
            "no iceberg-spark-runtime jar on the classpath in this container"
        )
    spark.sql("CREATE NAMESPACE IF NOT EXISTS msk_test")
    ident = "msk_test.seam_roundtrip"
    df = spark.range(3).withColumnRenamed("id", "k")
    try:
        write_table(df, ident, mode="overwrite")
        assert read_table(spark, ident).count() == 3
        write_table(df, ident, mode="append")
        assert read_table(spark, ident).count() == 6
        write_table(df, ident, mode="overwrite")
        assert read_table(spark, ident).count() == 3
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {ident}")
