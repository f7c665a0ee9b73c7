"""KMV sketch: exactness below k, accuracy envelope, lattice merge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.sketch import (
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_exact_below_k(spark):
    """A group with < k distinct values reports the EXACT count (the sketch
    holds every hash), including under duplicates."""
    rows = [(i % 40, "a") for i in range(500)] + [(i, "b") for i in range(10)]
    df = spark.createDataFrame(rows, "v long, g string")
    est = kmv_estimate(kmv_sketch(df, ["g"], "v", k=64), ["g"], k=64).collect()
    got = {r["g"]: (r["n_kept"], r["est_distinct"]) for r in est}
    assert got["a"] == (40, 40.0)
    assert got["b"] == (10, 10.0)


def test_accuracy_envelope(spark):
    """k=256 → stderr ≈ 1/√254 ≈ 6.3%; assert within 4 sigma on a
    25k-distinct group (deterministic hash → this is a fixed number)."""
    n = 25_000
    df = spark.createDataFrame([(i, "g") for i in range(n)], "v long, g string")
    est = kmv_estimate(kmv_sketch(df, ["g"], "v", k=256), ["g"], k=256).collect()[0]
    assert est["n_kept"] == 256
    assert abs(est["est_distinct"] - n) / n < 0.25


def test_merge_equals_sketch_of_union(spark):
    """kmv_merge(sketch(A), sketch(B)) == sketch(A ∪ B) EXACTLY — the
    lattice property that makes per-partition sketches roll up."""
    a = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(0, 4000, 2)], "v long, g string"
    )
    b = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(1000, 5000, 3)], "v long, g string"
    )
    k = 32
    sa = kmv_sketch(a, ["g"], "v", k=k)
    sb = kmv_sketch(b, ["g"], "v", k=k)
    merged = {tuple(r) for r in kmv_merge(sa, sb, ["g"], k).collect()}
    union = {tuple(r) for r in kmv_sketch(a.unionByName(b), ["g"], "v", k=k).collect()}
    assert merged == union
    # and therefore identical estimates
    em = {tuple(r) for r in kmv_estimate(kmv_merge(sa, sb, ["g"], k), ["g"], k).collect()}
    eu = {tuple(r) for r in kmv_estimate(kmv_sketch(a.unionByName(b), ["g"], "v", k=k), ["g"], k).collect()}
    assert em == eu


def test_k_validation(spark):
    df = spark.createDataFrame([(1, "g")], "v long, g string")
    with pytest.raises(ValueError):
        kmv_sketch(df, ["g"], "v", k=1)
