"""operators/rolling.rolling_agg — trailing RANGE-frame aggregates.

Pins: frame semantics (inclusive current second + peers, trailing
window_s), exactness vs a brute-force python recompute, and intra-second
tie-order independence.
"""

from __future__ import annotations

import datetime as dt

from metric_search_spark.operators.rolling import rolling_agg
from tests.sparkutil import get_spark

_T0 = dt.datetime(2024, 1, 1)


def _ev(i, user, sec, val):
    return (i, user, _T0 + dt.timedelta(seconds=sec), float(val))


def test_frame_semantics_vs_brute_force():
    spark = get_spark()
    rows = [
        _ev(0, 1, 0, 1.5),
        _ev(1, 1, 10, 2.25),
        _ev(2, 1, 10, 4.0),  # peer second: both rows see each other
        _ev(3, 1, 15, 1.0),
        _ev(4, 1, 3616, 8.0),  # 3606s after t=10: those rows age out
        _ev(5, 2, 5, 7.0),  # other user: independent frame
    ]
    spark_rows = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["event_id"]: (r["roll_n"], r["roll_sum_scaled"])
        for r in rolling_agg(
            spark_rows, "value", "ts", partition_cols=["user_id"], window_s=3600
        ).collect()
    }
    sc = lambda v: int(v * 65536)  # noqa: E731 — all fixture values dyadic
    for i, user, ts, _ in rows:
        sec = int((ts - _T0).total_seconds())
        frame = [
            r
            for r in rows
            if r[1] == user and sec - 3600 <= (r[2] - _T0).total_seconds() <= sec
        ]
        assert got[i] == (len(frame), sum(sc(r[3]) for r in frame)), i


def test_tie_order_independence():
    spark = get_spark()
    rows = [_ev(i, 1, 100, float(i)) for i in range(6)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    a = sorted(
        map(
            tuple,
            rolling_agg(df, "value", "ts", partition_cols=["user_id"]).select(
                "event_id", "roll_n", "roll_sum_scaled"
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            rolling_agg(
                df.orderBy(df.event_id.desc()), "value", "ts",
                partition_cols=["user_id"],
            ).select("event_id", "roll_n", "roll_sum_scaled").collect(),
        )
    )
    assert a == b
    # every peer row sees the whole second
    assert all(n == 6 for _, n, _ in a)
