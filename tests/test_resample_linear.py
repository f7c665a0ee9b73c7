"""resample_linear: exact-integer interpolation hand cases — midpoints,
negative-slope floor division, truncation-gap NOCB, on-observation hits,
grid bounds, and floordiv-vs-truncation semantics."""

from __future__ import annotations

from metric_search_spark.operators.resample import resample_linear
from tests.sparkutil import get_spark


def _run(rows, step_s=3600):
    spark = get_spark()
    e = spark.createDataFrame(rows, "user_id long, sec long, v long")
    out = resample_linear(
        e, by="user_id", sec_col="sec", value_col="v", step_s=step_s
    ).collect()
    return {(r.user_id, r.pos): (r.sec, r.v) for r in out}


def test_midpoint_and_bounds():
    got = _run([(1, 0, 0), (1, 7200, 720)])
    assert got == {
        (1, 0): (0, 0),
        (1, 1): (3600, 360),
        (1, 2): (7200, 720),
    }


def test_negative_slope_floors():
    # v = 10 + floor((3-10)*3600 / 7000) = 10 + floor(-3.6) = 10 - 4 = 6
    got = _run([(2, 0, 10), (2, 7000, 3)])
    assert got[(2, 1)] == (3600, 6)
    # truncation toward zero would give 10 - 3 = 7 — pin the floor contract
    assert got[(2, 1)][1] != 7


def test_truncation_gap_uses_nocb():
    # first event at 5400: grid starts at 3600 (hour floor), where no
    # prior event exists -> forward bracket's value carries back
    got = _run([(3, 5400, 42), (3, 9000, 100)])
    assert got[(3, 0)] == (3600, 42)
    assert got[(3, 1)] == (7200, 42 + (100 - 42) * (7200 - 5400) // 3600)


def test_exact_hit_and_tail_locf():
    # events at 0 and 3600; grid point 3600 sits ON the second event
    got = _run([(4, 0, 5), (4, 3600, 11)])
    assert got[(4, 1)] == (3600, 11)
    # single-event key: one grid row, value carried
    got = _run([(5, 3600, 77)])
    assert got == {(5, 0): (3600, 77)}


def test_multi_key_isolation():
    got = _run([(6, 0, 0), (6, 7200, 72), (7, 0, 1000), (7, 7200, 0)])
    assert got[(6, 1)] == (3600, 36)
    assert got[(7, 1)] == (3600, 500)
