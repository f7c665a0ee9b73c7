"""Hull diameter via rotating calipers: kernel-level brute parity over
pseudo-random point sets (incl. heavy ties), tie-break semantics, the
duplicate-coordinate id carry, degenerate groups, and the Spark operator
end-to-end against a python all-pairs twin."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.operators.hull import (
    antipodal_pairs,
    hull_diameter,
    hull_indices,
)
from tests.sparkutil import get_spark


def _minstd(seed: int):
    state = seed

    def nxt(mod: int) -> int:
        nonlocal state
        state = (state * 48271) % 2147483647
        return state % mod

    return nxt


def _calipers_diam2(x: np.ndarray, y: np.ndarray) -> int:
    hull = hull_indices(x.astype(np.float64), y.astype(np.float64))
    hx, hy = x[hull].astype(np.int64), y[hull].astype(np.int64)
    cand = antipodal_pairs(hx, hy)
    if not cand:
        return 0
    return max(int((hx[i] - hx[j]) ** 2 + (hy[i] - hy[j]) ** 2) for i, j in cand)


def test_calipers_matches_all_pairs_brute():
    # 200 pseudo-random point sets, coords on a small grid to force
    # collinear hulls, parallel edges and distance ties
    nxt = _minstd(7)
    for trial in range(200):
        n = 2 + nxt(40)
        g = 3 + nxt(30)
        x = np.array([nxt(g) for _ in range(n)], dtype=np.int64)
        y = np.array([nxt(g) for _ in range(n)], dtype=np.int64)
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        want = int((dx * dx + dy * dy).max())
        got = _calipers_diam2(x, y)
        assert got == want, f"trial {trial}: {got} != {want}\n{x=}\n{y=}"


def test_antipodal_square_and_hexagon_cover_all_diameter_pairs():
    # square: both diagonals attain the diameter
    hx = np.array([0, 2, 2, 0], dtype=np.int64)
    hy = np.array([0, 0, 2, 2], dtype=np.int64)
    hull = hull_indices(hx.astype(float), hy.astype(float))
    px, py = hx[hull], hy[hull]
    cand = antipodal_pairs(px, py)
    d2 = {(min(int(px[i]), int(px[j])), 8) for i, j in cand
          if (px[i] - px[j]) ** 2 + (py[i] - py[j]) ** 2 == 8}
    assert len({tuple(sorted((int(i), int(j)))) for i, j in cand
                if (px[i] - px[j]) ** 2 + (py[i] - py[j]) ** 2 == 8}) == 2
    # integer octagon: the four main diagonals all attain d2 = 40
    pts = [(3, 1), (1, 3), (-1, 3), (-3, 1), (-3, -1), (-1, -3), (1, -3), (3, -1)]
    hx = np.array([p[0] for p in pts], dtype=np.int64)
    hy = np.array([p[1] for p in pts], dtype=np.int64)
    hull = hull_indices(hx.astype(float), hy.astype(float))
    px, py = hx[hull], hy[hull]
    cand = antipodal_pairs(px, py)
    diag = {tuple(sorted((int(i), int(j)))) for i, j in cand
            if (px[i] - px[j]) ** 2 + (py[i] - py[j]) ** 2 == 40}
    assert len(diag) == 4


def _spark_diam(rows, res=3):
    spark = get_spark()
    df = spark.createDataFrame(rows, "g long, x double, y double, id long")
    out = hull_diameter(df, ["g"], id_col="id", res=res).collect()
    return {r["g"]: (r["diam2"], r["a_id"], r["b_id"]) for r in out}


def _center(c: int, res: int = 3) -> float:
    return (c + 0.5) / (1 << res)


def test_operator_hand_case_and_tie_break():
    # group 0: 3x3 square corners at res-3 cells; diameter = the two
    # diagonals (d2 = 8); ids chosen so the winning pair is (1, 4)
    rows = [
        (0, _center(0), _center(0), 5),
        (0, _center(2), _center(0), 1),
        (0, _center(2), _center(2), 9),
        (0, _center(0), _center(2), 4),
        # group 1: two points only
        (1, _center(1), _center(1), 7),
        (1, _center(4), _center(5), 3),
    ]
    out = _spark_diam(rows)
    assert out[0] == (8, 1, 4)  # pair (5,9) ties at 8 but (1,4) < (5,9)
    assert out[1] == (25, 3, 7)


def test_operator_duplicate_coordinates_carry_min_ids():
    # two coords, several duplicates: diameter pair must use the MIN id
    # at each endpoint
    rows = [
        (0, _center(0), _center(0), 12),
        (0, _center(0), _center(0), 3),
        (0, _center(5), _center(0), 8),
        (0, _center(5), _center(0), 20),
    ]
    out = _spark_diam(rows)
    assert out[0] == (25, 3, 8)


def test_operator_single_cell_and_single_point_groups():
    rows = [
        # group 0: all points in ONE grid cell -> diam2 0, two smallest ids
        (0, _center(2), _center(2), 9),
        (0, _center(2), _center(2), 2),
        (0, _center(2), _center(2), 5),
        # group 1: a single point -> no pair, group omitted
        (1, _center(1), _center(1), 1),
    ]
    out = _spark_diam(rows)
    assert out[0] == (0, 2, 5)
    assert 1 not in out


def test_operator_brute_parity_random_groups():
    nxt = _minstd(99)
    rows = []
    uid = 0
    for g in range(6):
        n = 2 + nxt(25)
        for _ in range(n):
            uid += 1 + nxt(5)  # unique, gappy, deterministic ids
            rows.append((g, _center(nxt(8)), _center(nxt(8)), uid))
    out = _spark_diam(rows)
    # python all-pairs twin over raw points
    import itertools

    by_g: dict[int, list] = {}
    for g, x, y, i in rows:
        by_g.setdefault(g, []).append((int(x * 8), int(y * 8), i))
    for g, pts in by_g.items():
        best = None
        for (xa, ya, ia), (xb, yb, ib) in itertools.combinations(pts, 2):
            if ia == ib:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            pair = tuple(sorted((ia, ib)))
            key = (-d2, pair)
            if best is None or key < best:
                best = key
        assert out[g] == (-best[0], best[1][0], best[1][1]), f"group {g}"


def test_validation():
    spark = get_spark()
    df = spark.createDataFrame([(0, 0.5, 0.5, 1)], "g long, x double, y double, id long")
    with pytest.raises(ValueError, match="res"):
        hull_diameter(df, ["g"], id_col="id", res=26)
