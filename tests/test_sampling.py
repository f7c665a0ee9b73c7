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


def test_weighted_sample_bias_and_invariance(spark):
    """A-ES semantics: (a) heavier rows are sampled more often across
    seeds — the whole point of the operator; (b) the winners are a pure
    function of (id, weight, seed) — identical under repartitioning;
    (c) weight <= 0 rows never appear; (d) n >= |rows| returns all
    positive-weight rows (exact, no replacement)."""
    from metric_search_spark.operators.sampling import sample_weighted

    rows = [(i, 100.0 if i % 10 == 0 else 1.0) for i in range(200)]
    rows.append((200, 0.0))
    rows.append((201, -3.0))
    df = spark.createDataFrame(rows, "id long, w double")

    heavy_hits = light_hits = 0
    for seed in range(8):
        got = sample_weighted(df, 20, weight_col="w", seed=seed).collect()
        ids = {r.id for r in got}
        assert 200 not in ids and 201 not in ids
        heavy_hits += sum(1 for i in ids if i % 10 == 0)
        light_hits += sum(1 for i in ids if i % 10 != 0)
    # 20 heavy rows hold 2000/2180 of the mass: with 8×20 draws the heavy
    # group must dominate (expected ~110+ heavy vs ~45 light)
    assert heavy_hits > light_hits, (heavy_hits, light_hits)

    a = sample_weighted(df, 20, weight_col="w", seed=3).collect()
    b = sample_weighted(
        df.repartition(13), 20, weight_col="w", seed=3
    ).collect()
    assert {(r.id, r.rk) for r in a} == {(r.id, r.rk) for r in b}

    full = sample_weighted(df, 1000, weight_col="w", seed=0).collect()
    assert len(full) == 200  # the two non-positive-weight rows are out


def test_weighted_sample_strata_and_plan(spark):
    """Per-stratum quotas are independent top-n, and even the GLOBAL
    variant keeps the WindowGroupLimit partial top-n (the property that
    makes a single-reducer window survive a 10^9-row corpus)."""
    from metric_search_spark.operators.sampling import sample_weighted
    from metric_search_spark.plans.inspect import explain_text

    df = spark.createDataFrame(
        [(i, float(1 + i % 3), "ab"[i % 2]) for i in range(100)],
        "id long, w double, g string",
    )
    per = sample_weighted(df, 7, weight_col="w", strata=["g"], seed=1)
    got = per.groupBy("g").count().collect()
    assert {r["count"] for r in got} == {7}

    glob = sample_weighted(df, 7, weight_col="w", seed=1)
    plan = explain_text(glob, mode="simple")
    # the unpartitioned rank<=n collapses to the distributed top-k
    # (TakeOrderedAndProject: per-partition heap + driver merge) — even
    # tighter than WindowGroupLimit; accept either proof that the
    # single-reducer window never sees the full corpus
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, plan
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be >= 1"):
        sample_weighted(df, 0, weight_col="w")
