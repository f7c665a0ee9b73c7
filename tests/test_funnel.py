"""Funnel operator: greedy-earliest ordering, strict ties, broken funnels."""

from __future__ import annotations

import datetime as dt

import pytest

from metric_search_spark.operators.funnel import funnel

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _ev(spark, rows):
    """rows = (event_id, second_offset, user_id, event_type)."""
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(seconds=s), u, t) for (i, s, u, t) in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def test_funnel_stages_and_ids(spark):
    ev = _ev(
        spark,
        [
            # user 1: full funnel, but with decoys (earlier click before
            # the view must NOT count; the later one is chosen)
            (1, 0, 1, "click"),
            (2, 1, 1, "view"),
            (3, 2, 1, "click"),
            (4, 3, 1, "purchase"),
            # user 2: view then purchase, never clicks → stage 1
            (5, 0, 2, "view"),
            (6, 1, 2, "purchase"),
            # user 3: no view at all → stage 0
            (7, 0, 3, "click"),
        ],
    )
    got = {
        r.user: (r.stage, r.e1, r.e2, r.e3)
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got[1] == (3, 2, 3, 4)
    assert got[2] == (1, 5, None, None)
    assert got[3] == (0, None, None, None)


def test_funnel_same_timestamp_strict_id_order(spark):
    """Equal timestamps: the stage-k event counts only with a LARGER id —
    and greedy-earliest picks the smallest valid (ts, id)."""
    ev = _ev(
        spark,
        [
            (10, 0, 1, "view"),
            (9, 0, 1, "click"),    # same ts, smaller id → rejected
            (11, 0, 1, "click"),   # same ts, larger id → accepted
            (8, 0, 2, "view"),
            (9000, 0, 2, "click"),
        ],
    )
    got = {r.user: (r.stage, r.e2) for r in funnel(ev, ["view", "click"]).collect()}
    assert got[1] == (2, 11)
    assert got[2] == (2, 9000)


def test_funnel_greedy_earliest_is_optimal(spark):
    """The earliest stage-1 choice never blocks a completion: view@0 then
    the only click is @5 — greedy picks view@0 and still completes."""
    ev = _ev(
        spark,
        [(1, 0, 1, "view"), (2, 3, 1, "view"), (3, 5, 1, "click")],
    )
    got = funnel(ev, ["view", "click"]).collect()[0]
    assert (got.stage, got.e1, got.e2) == (2, 1, 3)


def test_funnel_single_stage_and_validation(spark):
    ev = _ev(spark, [(1, 0, 1, "view")])
    out = funnel(ev, ["view"]).collect()[0]
    assert (out.stage, out.e1) == (1, 1)
    with pytest.raises(ValueError, match="at least one stage"):
        funnel(ev, [])
