"""Exact type-1 quantiles: rank convention, groups, single shuffle."""

from __future__ import annotations

import pytest

from metric_search_spark.operators.quantiles import exact_quantiles

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_rank_convention_small(spark):
    """n=4 values [10,20,30,40]: ceil(q*n) ranks — q=0.25→rank1=10,
    q=0.5→rank2=20, q=0.51→rank3=30, q=1.0→rank4=40."""
    df = spark.createDataFrame([(float(v),) for v in (30, 10, 40, 20)], "v double")
    got = {
        r.q: r.val
        for r in exact_quantiles(df, "v", [0.25, 0.5, 0.51, 1.0]).collect()
    }
    assert got == {0.25: 10.0, 0.5: 20.0, 0.51: 30.0, 1.0: 40.0}


def test_groups_and_duplicate_values(spark):
    """Per-group independence; duplicate values give a well-defined answer
    (the value at the rank, whichever physical row carries it)."""
    rows = [("a", v) for v in (1.0, 1.0, 2.0, 9.0)] + [
        ("b", v) for v in (5.0, 5.0, 5.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.g, r.q): r.val
        for r in exact_quantiles(df, "v", [0.5, 1.0], group_cols=["g"]).collect()
    }
    assert got == {("a", 0.5): 1.0, ("a", 1.0): 9.0, ("b", 0.5): 5.0, ("b", 1.0): 5.0}


def test_validation_and_single_exchange(spark):
    from metric_search_spark.plans.inspect import count_exchanges

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="at least one"):
        exact_quantiles(df, "v", [])
    with pytest.raises(ValueError, match="not in"):
        exact_quantiles(df, "v", [0.0])
    out = exact_quantiles(df, "v", [0.5, 0.9], group_cols=["g"])
    # row_number and count-over-partition share ONE exchange on the group
    # key — the per-group sort is the only shuffle
    assert count_exchanges(out) == 1
