"""operators/intervals.interval_overlap_join — bucketed interval join.

Pins: half-open overlap semantics vs brute force (incl. touching
intervals NOT matching and bucket-boundary straddles), bucket-width
invariance, and the no-nested-loop plan shape.
"""

from __future__ import annotations

import itertools

from metric_search_spark.operators.intervals import interval_overlap_join
from tests.sparkutil import get_spark

LEFT = [
    (0, 100, 200),
    (1, 3500, 3700),  # straddles the 3600 bucket boundary
    (2, 7200, 7300),
    (3, 200, 300),  # touches win 10's start: must NOT match
]
RIGHT = [
    (10, 300, 400),
    (11, 150, 3600),
    (12, 3600, 8000),  # starts exactly on a bucket edge
]


def _brute():
    out = set()
    for (li, ls, le), (ri, rs, re) in itertools.product(LEFT, RIGHT):
        if ls < re and rs < le:
            out.add((li, ri, min(le, re) - max(ls, rs)))
    return out


def _run(bucket_s):
    spark = get_spark()
    left = spark.createDataFrame(LEFT, "lid long, astart long, aend long")
    right = spark.createDataFrame(RIGHT, "rid long, wstart long, wend long")
    df = interval_overlap_join(
        left,
        right,
        left_start="astart",
        left_end="aend",
        right_start="wstart",
        right_end="wend",
        bucket_s=bucket_s,
    )
    return df


def test_matches_brute_force_and_bucket_invariance():
    for b in (60, 3600, 100000):
        got = {
            (r["lid"], r["rid"], r["overlap_s"]) for r in _run(b).collect()
        }
        assert got == _brute(), f"bucket_s={b}"


def test_plan_is_equi_join():
    plan = _run(3600)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
