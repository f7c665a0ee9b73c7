"""Resample + LOCF: grid bounds, carry semantics, truncation gap."""

from __future__ import annotations

import datetime as dt

import pytest

from metric_search_spark.operators.resample import resample_locf

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _ev(spark, rows):
    """rows = (user, minute_offset, eid)."""
    base = dt.datetime(2024, 1, 1, 0, 30)  # :30 — exercises the trunc gap
    return spark.createDataFrame(
        [(u, base + dt.timedelta(minutes=m), e) for (u, m, e) in rows],
        "user_id long, ts timestamp_ntz, eid long",
    )


def test_grid_and_carry(spark):
    """User 1: events at 00:30 (e1) and 02:30 (e2). Hourly grid from
    trunc(00:30)=00:00 to 02:30 → 00:00, 01:00, 02:00 (pos 0..2).
    00:00 precedes the first event → NULL; 01:00 and 02:00 carry e1."""
    ev = _ev(spark, [(1, 0, 1), (1, 120, 2)])
    got = {
        r.pos: r.eid_r
        for r in resample_locf(ev, carry=["eid"], right_order="eid").collect()
    }
    assert got == {0: None, 1: 1, 2: 1}


def test_grid_point_on_event_is_inclusive(spark):
    """An event exactly on a grid point is carried AT that point."""
    ev = _ev(spark, [(1, 30, 7)])  # 01:00 exactly; grid 01:00 only? no:
    # trunc(01:00)=01:00, max=01:00 → single grid point at the event
    got = resample_locf(ev, carry=["eid"]).collect()
    assert len(got) == 1 and got[0].pos == 0 and got[0].eid_r == 7


def test_per_user_independence_and_duplicate_ts(spark):
    """Grids are per user (each starts at ITS OWN truncated min);
    duplicate-ts events resolve to the right_order max."""
    ev = _ev(spark, [(1, 0, 1), (1, 0, 9), (1, 60, 2), (2, 90, 5)])
    out = resample_locf(ev, carry=["eid"], right_order="eid").collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, {})[r.pos] = r.eid_r
    # user 1: events 00:30 (ids 1,9 — dup ts) and 01:30; grid 00:00, 01:00
    # → 01:00 carries the right_order max of the duplicate pair, id 9
    assert by_user[1] == {0: None, 1: 9}
    # user 2: single event at 02:00 exactly; grid = that one point,
    # inclusive carry
    assert by_user[2] == {0: 5}
