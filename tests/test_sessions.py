"""operators/sessions.sessionize — gap-based session numbering."""

from __future__ import annotations

import datetime as dt

from metric_search_spark.operators.sessions import sessionize
from tests.sparkutil import get_spark

_T0 = dt.datetime(2024, 1, 1)


def _rows():
    # user 1: events at 0s, 100s, 1900s (gap 1800 == gap_s: SAME session),
    # 3800s (gap 1900 > gap_s: new), 3801s
    # user 2: single event
    secs = {1: [0, 100, 1900, 3800, 3801], 2: [50]}
    return [
        (u, i * 10 + j, _T0 + dt.timedelta(seconds=s))
        for u, ss in secs.items()
        for j, s in enumerate(ss)
        for i in [u]
    ]


def test_gap_semantics_and_determinism():
    spark = get_spark()
    df = spark.createDataFrame(_rows(), "user_id long, event_id long, ts timestamp")
    out = sessionize(
        df, "ts", partition_cols=["user_id"], order_tiebreak="event_id"
    )
    got = sorted(
        (r["user_id"], r["event_id"], r["session_idx"]) for r in out.collect()
    )
    want = [
        (1, 10, 0), (1, 11, 0), (1, 12, 0),  # gap == 1800 continues
        (1, 13, 1), (1, 14, 1),
        (2, 20, 0),
    ]
    assert got == want
    rep = sorted(
        (r["user_id"], r["event_id"], r["session_idx"])
        for r in sessionize(
            df.repartition(7), "ts",
            partition_cols=["user_id"], order_tiebreak="event_id",
        ).collect()
    )
    assert rep == want
