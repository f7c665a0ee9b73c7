"""Deterministic sampling operators: python-twin parity, partition
invariance, quota exactness, and the WindowGroupLimit plan pin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.sampling import (
    _A,
    _M,
    hash_col,
    sample_hash,
    sample_hash_sql,
    sample_stratified,
)
from metric_search_spark.plans.inspect import count_exchanges, explain_text

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _hash_py(i: int, seed: int = 0) -> int:
    x = (i + 131071 * seed) % _M + 1
    h1 = (x * _A) % _M
    h1x = h1 ^ (h1 >> 13)
    return ((h1x % _M) * _A) % _M


def test_hash_col_matches_python_and_duckdb(spark):
    import duckdb

    ids = [0, 1, 2, 7, 131071, 2**31, 2**40, 999999999999]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    for seed in (0, 11):
        got = {
            r["id"]: r["h"]
            for r in df.select("id", hash_col(F.col("id"), seed).alias("h")).collect()
        }
        assert got == {i: _hash_py(i, seed) for i in ids}
        sql = sample_hash_sql("id", seed)
        want = dict(
            duckdb.sql(
                f"SELECT id, {sql} FROM (SELECT unnest({ids}) AS id)"
            ).fetchall()
        )
        assert got == want


def test_stratified_exact_quota_and_partition_invariance(spark):
    rows = [(i, f"s{i % 7}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    out = sample_stratified(df, ["stratum"], 12, seed=3)
    pdf = out.toPandas()
    counts = pdf.groupby("stratum").size()
    assert (counts == 12).all() and len(counts) == 7
    assert sorted(pdf["rk"].unique()) == list(range(1, 13))
    # exact expected membership from the python twin
    want = set()
    for s in range(7):
        members = sorted(
            (i for i in range(500) if i % 7 == s),
            key=lambda i: (_hash_py(i, 3), i),
        )[:12]
        want |= {(i, f"s{s}") for i in members}
    assert set(zip(pdf["id"], pdf["stratum"])) == want
    # any partitioning, same sample
    out2 = sample_stratified(df.repartition(23), ["stratum"], 12, seed=3)
    assert set(map(tuple, out2.collect())) == set(map(tuple, out.collect()))
    # quota larger than the stratum → whole stratum, no padding
    tiny = sample_stratified(df.where(F.col("id") < 3), ["stratum"], 12, seed=3)
    assert tiny.count() == 3


def test_stratified_plan_has_window_group_limit(spark):
    """rank<=n must trigger the partial top-n (each map task forwards only
    its local top-n) — without it a hot stratum shuffles all its rows."""
    df = spark.createDataFrame([(i, f"s{i % 3}") for i in range(100)],
                               "id long, stratum string")
    out = sample_stratified(df, ["stratum"], 5)
    plan = explain_text(out, mode="simple")
    assert "WindowGroupLimit" in plan


def test_sample_hash_rate_and_determinism(spark):
    n = 20_000
    df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out = sample_hash(df, 0.25, seed=5)
    k = out.count()
    assert abs(k / n - 0.25) < 0.02
    # pure filter: no exchange in the plan
    assert count_exchanges(out) == 0
    # subset property is NOT promised across fractions in general hashing,
    # but IS here (same hash, threshold monotone): a 10% sample nests in 25%
    k10 = set(r[0] for r in sample_hash(df, 0.10, seed=5).collect())
    k25 = set(r[0] for r in out.collect())
    assert k10 <= k25
    with pytest.raises(ValueError):
        sample_hash(df, 1.5)
