"""Exact EDT: numpy brute parity, zero-on-occupied, diagonal exactness
(true Euclidean, not chamfer), empty-column handling, sentinel."""

from __future__ import annotations

import numpy as np

from metric_search_spark.operators.flow import distance_transform
from tests.sparkutil import get_spark

_RES = 3  # 8x8
_LIM = 8


def _run(cells):
    spark = get_spark()
    rows = []
    for cx, cy in cells:
        rows.append(((cx + 0.5) / _LIM, (cy + 0.5) / _LIM))
    df = spark.createDataFrame(rows, "x double, y double")
    out = distance_transform(df, _RES).collect()
    # decode morton tile back via brute match on count
    from metric_search_spark.cells import interleave_bits

    t2d = {}
    for cx in range(_LIM):
        for cy in range(_LIM):
            t = (_RES << 56) | int(
                interleave_bits(np.array([cx]), np.array([cy]))[0]
            )
            t2d[(cx, cy)] = t
    by_tile = {r.tile: r.d2 for r in out}
    return {k: by_tile[t] for k, t in t2d.items()}


def test_matches_bruteforce_and_diagonals():
    cells = [(1, 1), (6, 2), (3, 5)]
    got = _run(cells)
    for cx in range(_LIM):
        for cy in range(_LIM):
            want = min((cx - ox) ** 2 + (cy - oy) ** 2 for ox, oy in cells)
            assert got[(cx, cy)] == want, (cx, cy)
    # true Euclidean at a diagonal: (0,0) vs nearest (1,1) -> 2 (a
    # 3-4 chamfer would report a scaled approximation)
    assert got[(0, 0)] == 2
    for c in cells:
        assert got[c] == 0


def test_single_far_corner():
    got = _run([(7, 7)])
    assert got[(0, 0)] == 2 * 49
    assert got[(7, 7)] == 0
    assert got[(0, 7)] == 49  # empty columns relay through the row pass
