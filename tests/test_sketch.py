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


# ---------------------------------------------------------------- HyperLogLog


def _hll_rho_np(hv, b):
    import numpy as np

    w = np.asarray(hv, dtype=np.int64) >> b
    top = 32 - b
    out = np.empty(len(w), dtype=np.int64)
    for i, x in enumerate(w):
        out[i] = top if x == 0 else top - int(x).bit_length()
    return out


def test_hll_rho_matches_numpy(spark):
    """ρ via length(bin(w)) — checked against int.bit_length over the
    value range including the w=0 and single-bit edges."""
    from metric_search_spark.operators.sketch import _hll_rho

    vals = [0, 1, 63, 64, 65, 2**25 - 1, 2**31 - 2, 12345678]
    df = spark.createDataFrame([(v,) for v in vals], "hv long")
    got = [
        r[0]
        for r in df.select(_hll_rho(F.col("hv"), 6)).collect()
    ]
    want = list(_hll_rho_np(vals, 6))
    assert got == want


def test_hll_accuracy_envelope(spark):
    """m=64 → stderr ≈ 1.04/8 = 13%; assert within ~3 sigma on a
    20k-distinct group (deterministic hash → a fixed number), raw branch."""
    from metric_search_spark.operators.sketch import hll_estimate, hll_sketch

    n = 20_000
    df = spark.createDataFrame([(i, "g") for i in range(n)], "v long, g string")
    est = hll_estimate(hll_sketch(df, ["g"], "v"), ["g"]).collect()[0]
    assert est["v_zeros"] == 0
    assert abs(est["est_distinct"] - n) / n < 0.4


def test_hll_duplicates_are_free(spark):
    """max() idempotence: duplicating every row leaves every register —
    and hence the estimate — bit-identical (KMV needs a distinct for
    this; HLL gets it from the algebra)."""
    from metric_search_spark.operators.sketch import hll_estimate, hll_sketch

    a = spark.createDataFrame([(i % 500, "g") for i in range(500)], "v long, g string")
    dup = a.unionByName(a).unionByName(a)
    ea = hll_estimate(hll_sketch(a, ["g"], "v"), ["g"]).collect()
    ed = hll_estimate(hll_sketch(dup, ["g"], "v"), ["g"]).collect()
    assert [tuple(r) for r in ea] == [tuple(r) for r in ed]


def test_hll_merge_equals_sketch_of_union(spark):
    """Register-wise max merge == sketch of the union, exactly."""
    from metric_search_spark.operators.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    a = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(0, 4000, 2)], "v long, g string"
    )
    b = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(1000, 5000, 3)], "v long, g string"
    )
    sa = hll_sketch(a, ["g"], "v")
    sb = hll_sketch(b, ["g"], "v")
    merged = {tuple(r) for r in hll_merge(sa, sb, ["g"]).collect()}
    union = {tuple(r) for r in hll_sketch(a.unionByName(b), ["g"], "v").collect()}
    assert merged == union
    em = {tuple(r) for r in hll_estimate(hll_merge(sa, sb, ["g"]), ["g"]).collect()}
    eu = {
        tuple(r)
        for r in hll_estimate(hll_sketch(a.unionByName(b), ["g"], "v"), ["g"]).collect()
    }
    assert em == eu


def test_hll_ln_parity_finite_input_set(spark):
    """The linear-counting branch computes m·ln(m/v) with v ∈ 1..m−1 — a
    FINITE input set. JVM ln and libm ln DO differ by 1 ulp on some of
    them (v=21 at m=64), so the round(9) is load-bearing: pin (a) the
    rounded values agree across engines on every possible input and
    (b) every input sits well clear of a round-9 boundary (measured
    worst case: 66 ulps at v=9; observed engine divergence: 1 ulp), so
    a last-ulp libm difference can never flip the rounded value."""
    import duckdb
    import math

    m = 64
    df = spark.createDataFrame([(v,) for v in range(1, m)], "v long")
    got = [
        r[0]
        for r in df.select(
            F.round(
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v").cast("double")),
                9,
            )
        ).orderBy(F.col("v")).collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT round({float(m)!r} * ln({float(m)!r} / v), 9)"
            f" FROM range(1, {m}) t(v) ORDER BY v"
        ).fetchall()
    ]
    assert got == want  # rounded equality, all 63 inputs
    for v in range(1, m):
        x = m * math.log(m / v)
        # distance of x·1e9's fractional part from the .5 boundary,
        # in units of x's ulp: must dwarf any 1-ulp engine divergence
        frac = abs(math.fmod(x * 1e9, 1.0) - 0.5)
        assert frac * 1e-9 > 30 * math.ulp(x), f"v={v} too close to boundary"
        assert got[v - 1] == pytest.approx(x, rel=1e-9)


def test_hll_b_validation(spark):
    from metric_search_spark.operators.sketch import hll_sketch

    df = spark.createDataFrame([(1, "g")], "v long, g string")
    with pytest.raises(ValueError, match="not supported"):
        hll_sketch(df, ["g"], "v", b=10)
