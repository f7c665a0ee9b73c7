"""Line-of-sight: clear vs blocked hand cases, endpoint-inside-obstacle
conservatism, grazing diagonal, every-pair-reported contract."""

from __future__ import annotations

import numpy as np

from metric_search_spark.cells import interleave_bits
from metric_search_spark.operators.pip import line_of_sight
from tests.sparkutil import get_spark

_RES = 3  # 8x8


def _tid(cx, cy):
    return (_RES << 56) | int(interleave_bits(np.array([cx]), np.array([cy]))[0])


def _c(i):
    return (i + 0.5) / (1 << _RES)


def _run(pairs, obstacles):
    spark = get_spark()
    pdf = spark.createDataFrame(
        [(i, ax, ay, bx, by) for i, (ax, ay, bx, by) in enumerate(pairs)],
        "pair_id long, ax double, ay double, bx double, by double",
    )
    odf = spark.createDataFrame([(_tid(cx, cy),) for cx, cy in obstacles], "tile long")
    out = line_of_sight(pdf, odf, res=_RES).collect()
    return {r["pair_id"]: (r["blocked"], r["n_blocking"]) for r in out}


def test_clear_blocked_and_endpoint_inside():
    obstacles = [(4, 2), (4, 3), (4, 4)]  # a vertical wall segment at cx=4
    pairs = [
        (_c(1), _c(3), _c(7), _c(3)),  # crosses the wall -> blocked (1 tile)
        (_c(1), _c(6), _c(7), _c(6)),  # passes above the wall -> clear
        (_c(4), _c(3), _c(7), _c(7)),  # STARTS inside an obstacle -> blocked
        (_c(1), _c(1), _c(1), _c(7)),  # vertical clear line
    ]
    out = _run(pairs, obstacles)
    assert out[0] == (True, 1)
    assert out[1] == (False, 0)
    assert out[2][0] is True
    assert out[3] == (False, 0)
    assert len(out) == 4  # every pair reported


def test_diagonal_counts_distinct_blocking_tiles():
    # diagonal from cell (0,0) center to (7,7) center passes through the
    # diagonal cells; block three of them
    obstacles = [(2, 2), (4, 4), (6, 6)]
    out = _run([(_c(0), _c(0), _c(7), _c(7))], obstacles)
    assert out[0] == (True, 3)


def test_near_miss_is_clear():
    # segment along the row-5 cell centers; obstacle in row 4 never touches
    out = _run([(_c(0), _c(5), _c(7), _c(5))], [(3, 4)])
    assert out[0] == (False, 0)
