"""Marching squares: hand rasters — single peak, saddle, plateau,
anchor universe (occupied-adjacent only), threshold sweep."""

from __future__ import annotations

from metric_search_spark.operators.flow import _MS_SEGS, contour_cases
from tests.sparkutil import get_spark

_RES = 3  # 8x8


def _run(cells, ts):
    spark = get_spark()
    rows = []
    for (cx, cy), n in cells.items():
        rows += [((cx + 0.5) / 8, (cy + 0.5) / 8)] * n
    df = spark.createDataFrame(rows, "x double, y double")
    out = contour_cases(df, _RES, ts).collect()
    return {(r.t, r.cs): (r.n_blocks, r.segs) for r in out}


def test_single_cell_peak():
    # one occupied cell (3,3): 4 blocks, each with exactly one hot corner
    got = _run({(3, 3): 5}, [1])
    # anchors (2,2),(3,2),(2,3),(3,3) -> cases 8,4,2,1 (one bit each)
    assert got == {
        (1, 8): (1, 1), (1, 4): (1, 1), (1, 2): (1, 1), (1, 1): (1, 1),
    }


def test_threshold_sweep_and_case15():
    # 2x2 plateau of height 3 at (3..4, 3..4)
    cells = {(x, y): 3 for x in (3, 4) for y in (3, 4)}
    got = _run(cells, [1, 4])
    # t=1: center block all-above -> case 15 (0 segs); 8 edge blocks
    assert got[(1, 15)] == (1, 0)
    assert sum(n for (t, c), (n, s) in got.items() if t == 1) == 9
    # t=4: nothing reaches 4 -> every touched block is case 0
    assert got[(4, 0)] == (9, 0)


def test_saddle_counts_two_segments():
    # diagonal corners hot, off-diagonal empty -> case 9 = 1+8 (not a
    # saddle) vs case 6 = 2+4... build a true saddle: hot at (2,2) and
    # (3,3), block anchored (2,2) has z00,z11 hot -> case 1+8=9 (saddle)
    got = _run({(2, 2): 2, (3, 3): 2}, [1])
    assert _MS_SEGS[9] == 2 and _MS_SEGS[6] == 2
    assert got[(1, 9)] == (1, 2)
