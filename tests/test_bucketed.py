"""Bucketed co-located joins: the zero-Exchange/zero-Sort SMJ contract,
the plain-Parquet contrast, result parity, and the idempotence probe."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from metric_search_spark.plans.inspect import count_exchanges, explain_text
from metric_search_spark.sources.buckets import (
    bucketed_ready,
    read_bucketed,
    write_bucketed,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


@pytest.fixture(scope="module")
def tables(spark):
    d = tempfile.mkdtemp(prefix="msk_buckets_")
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 97).alias("va")
    )
    b = spark.range(0, 10_000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 89).alias("vb")
    )
    write_bucketed(a, "bkt_a", f"{d}/a", "k", 8)
    write_bucketed(b, "bkt_b", f"{d}/b", "k", 8)
    return a, b


def _smj(left, right):
    # force SMJ so the pin measures bucketing, not broadcast
    return left.hint("merge").join(right, "k")


def test_bucketed_join_no_exchange(spark, tables):
    j = _smj(read_bucketed(spark, "bkt_a"), read_bucketed(spark, "bkt_b"))
    assert count_exchanges(j) == 0
    simple = explain_text(j, mode="simple")
    assert "SortMergeJoin" in simple
    assert "Bucketed: true" in simple


def test_plain_parquet_contrast_shuffles(spark, tables):
    a, b = tables
    d = tempfile.mkdtemp(prefix="msk_plain_")
    a.write.mode("overwrite").parquet(f"{d}/a")
    b.write.mode("overwrite").parquet(f"{d}/b")
    j = _smj(spark.read.parquet(f"{d}/a"), spark.read.parquet(f"{d}/b"))
    assert count_exchanges(j) == 2  # both sides pay the shuffle every run


def test_result_parity(spark, tables):
    a, b = tables
    got = (
        _smj(read_bucketed(spark, "bkt_a"), read_bucketed(spark, "bkt_b"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("va") * F.col("vb")).alias("dot"),
        )
        .collect()[0]
    )
    want = (
        a.join(b, "k")
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("va") * F.col("vb")).alias("dot"),
        )
        .collect()[0]
    )
    assert (got["n"], got["dot"]) == (want["n"], want["dot"])
    assert got["n"] == 5_000


def test_bucketed_ready_probe(spark, tables):
    assert bucketed_ready(spark, "bkt_a", 8)
    assert not bucketed_ready(spark, "bkt_a", 16)
    assert not bucketed_ready(spark, "no_such_table", 8)


def test_aggregate_on_bucket_key_no_exchange(spark, tables):
    """Bucketing also pre-partitions GROUP BY on the key: the aggregate
    runs bucket-local, no Exchange."""
    agg = (
        read_bucketed(spark, "bkt_a")
        .groupBy("k")
        .agg(F.sum("va").alias("s"))
    )
    assert count_exchanges(agg) == 0
