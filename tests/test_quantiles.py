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


def test_mad_outliers_golden_and_zero_mad(spark):
    """Hand-checkable: group a = [1,1,1,1,100] → med=1 (rank 3 of 5),
    deviations [0,0,0,0,99] → MAD=0 → only 100 flagged (dev > 0). Group b
    symmetric spread → nothing beyond k·MAD."""
    from metric_search_spark.operators.quantiles import mad_outliers

    rows = [("a", v) for v in (1.0, 1.0, 1.0, 1.0, 100.0)] + [
        ("b", v) for v in (10.0, 20.0, 30.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    got = mad_outliers(df, "v", group_cols=["g"], k=1.5).collect()
    assert [(r.g, r.v, r.med, r.mad, r.dev) for r in got] == [
        ("a", 100.0, 1.0, 0.0, 99.0)
    ]
    # b: med=20, devs [10,0,10], MAD=10, k*MAD=15 → none flagged


def test_mad_outliers_global_group(spark):
    from metric_search_spark.operators.quantiles import mad_outliers

    df = spark.createDataFrame(
        [(float(v),) for v in (1, 2, 3, 4, 1000)], "v double"
    )
    got = mad_outliers(df, "v", k=3.0).collect()
    assert [r.v for r in got] == [1000.0]  # med=3, MAD=1, |1000-3| > 3


def test_equiwidth_histogram_golden(spark):
    """[0..10] in 5 bins of width 2: v=10 (the max) clamps into bin 4;
    interior edge v=2 goes to the UPPER bin (floor((2-0)*5/10)=1); empty
    bins appear as zeros; degenerate group collapses to bin 0."""
    from metric_search_spark.operators.quantiles import equiwidth_histogram

    rows = [("a", float(v)) for v in (0, 1, 2, 10)] + [("c", 7.0), ("c", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.g, r.bin): r.n
        for r in equiwidth_histogram(df, "v", 5, group_cols=["g"]).collect()
    }
    assert got == {
        ("a", 0): 2, ("a", 1): 1, ("a", 2): 0, ("a", 3): 0, ("a", 4): 1,
        ("c", 0): 2, ("c", 1): 0, ("c", 2): 0, ("c", 3): 0, ("c", 4): 0,
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bins"):
        equiwidth_histogram(df, "v", 0)


def test_transition_counts_golden(spark):
    """Two users: u1 a→b→a, u2 a→b. Transitions: a→b ×2 (p=1.0),
    b→a ×1 (p=1.0). Cross-user boundaries never create transitions."""
    import datetime as dt

    from metric_search_spark.operators.transitions import transition_counts

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "a"),
        (2, base + dt.timedelta(seconds=1), 1, "b"),
        (3, base + dt.timedelta(seconds=2), 1, "a"),
        (4, base, 2, "a"),
        (5, base + dt.timedelta(seconds=1), 2, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )
    got = {
        (r.src_type, r.dst_type): (r.n, r.p)
        for r in transition_counts(ev).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}
