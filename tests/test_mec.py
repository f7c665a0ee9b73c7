"""Minimum enclosing circle: textbook cases (right/obtuse → diametral
pair, acute → circumcircle triple), hull-restriction equivalence, the
pair-over-triple tie-break, single-cell groups, and Spark end-to-end."""

from __future__ import annotations

from fractions import Fraction

import pytest

from metric_search_spark.operators.hull import (
    mec_exact,
    min_enclosing_circle,
)
from tests.sparkutil import get_spark

_RES = 4  # operator tests quantize onto a 16-grid


def _r2(got):
    return Fraction(got["r2n"], got["r2d"])


def test_right_triangle_hypotenuse_pair():
    # (0,0),(8,0),(0,6): right angle at origin; MEC = hypotenuse circle,
    # r² = 25, defined by the PAIR (ids 1,2) even though the circumcircle
    # triple describes the same circle
    got = mec_exact([(0, 0, 9), (8, 0, 1), (0, 6, 2)])
    assert _r2(got) == 25 and (got["a"], got["b"], got["c"]) == (1, 2, None)


def test_obtuse_triangle_longest_side():
    # (0,0),(10,0),(5,1): obtuse spread; MEC = diametral circle of the
    # base, the apex is inside (5² + ... check: center (5,0), r²=25;
    # apex distance² = 0+1 = 1 ≤ 25)
    got = mec_exact([(0, 0, 3), (10, 0, 7), (5, 1, 5)])
    assert _r2(got) == 25 and (got["a"], got["b"], got["c"]) == (3, 7, None)


def test_acute_triangle_circumcircle():
    # equilateral-ish (0,0),(4,0),(2,3): all angles acute -> triple
    got = mec_exact([(0, 0, 1), (4, 0, 2), (2, 3, 3)])
    assert got["c"] is not None
    # circumcircle: center (2, 5/6), r² = 4 + 25/36 = 169/36
    assert _r2(got) == Fraction(169, 36)
    assert (got["a"], got["b"], got["c"]) == (1, 2, 3)


def test_square_diagonal_tie_break():
    # square corners: both diagonals give the same circle; smallest
    # sorted id pair wins
    got = mec_exact([(0, 0, 40), (6, 0, 10), (6, 6, 30), (0, 6, 20)])
    assert _r2(got) == 18
    assert (got["a"], got["b"], got["c"]) == (10, 20, None)


def test_interior_points_do_not_change_answer():
    base = [(0, 0, 1), (12, 0, 2), (6, 9, 3)]
    noisy = base + [(5, 3, 50), (7, 2, 51), (6, 1, 52)]
    assert mec_exact(base) == mec_exact(noisy)


def _brute_reference(pts):
    """All-candidates brute with Fraction arithmetic — independent of the
    reduced-int representation."""
    from itertools import combinations

    best = None
    for sub in list(combinations(pts, 2)) + list(combinations(pts, 3)):
        if len(sub) == 2:
            (xa, ya, ia), (xb, yb, ib) = sub
            cx, cy = Fraction(xa + xb, 2), Fraction(ya + yb, 2)
            ids = tuple(sorted((ia, ib))) + (None,)
        else:
            (xa, ya, ia), (xb, yb, ib), (xc, yc, ic) = sub
            d = 2 * (xa * (yb - yc) + xb * (yc - ya) + xc * (ya - yb))
            if d == 0:
                continue
            a2, b2, c2 = xa * xa + ya * ya, xb * xb + yb * yb, xc * xc + yc * yc
            cx = Fraction(a2 * (yb - yc) + b2 * (yc - ya) + c2 * (ya - yb), d)
            cy = Fraction(a2 * (xc - xb) + b2 * (xa - xc) + c2 * (xb - xa), d)
            ids = tuple(sorted((ia, ib, ic)))
        r2 = (xa - cx) ** 2 + (ya - cy) ** 2
        if any((x - cx) ** 2 + (y - cy) ** 2 > r2 for x, y, _ in pts):
            continue
        key = (r2, ids[2] is not None, ids[0], ids[1], ids[2] or -1)
        if best is None or key < best:
            best = key
    return best


def test_brute_parity_pseudorandom():
    state = 23

    def nxt(m):
        nonlocal state
        state = (state * 48271) % 2147483647
        return state % m

    for trial in range(60):
        n = 2 + nxt(12)
        seen = {}
        for _ in range(n):
            xy = (nxt(20), nxt(20))
            if xy not in seen:
                seen[xy] = 100 + len(seen)
        pts = [(x, y, i) for (x, y), i in seen.items()]
        if len(pts) < 2:
            continue
        got = mec_exact(pts)
        r2, is3, a, b, c = _brute_reference(pts)
        assert _r2(got) == r2, trial
        assert (got["a"], got["b"], got["c"]) == (a, b, None if c == -1 else c), trial


def _center(c: int) -> float:
    return (c + 0.5) / (1 << _RES)


def test_spark_end_to_end():
    spark = get_spark()
    rows = [
        # group 0: right triangle on the grid -> hypotenuse pair
        (0, _center(0), _center(0), 9),
        (0, _center(8), _center(0), 1),
        (0, _center(0), _center(6), 2),
        # group 1: all in one cell -> r²=0, two smallest ids
        (1, _center(3), _center(3), 12),
        (1, _center(3), _center(3), 4),
        (1, _center(3), _center(3), 8),
        # group 2: a single point -> omitted
        (2, _center(5), _center(5), 1),
    ]
    df = spark.createDataFrame(rows, "g long, x double, y double, id long")
    out = {
        r["g"]: (r["r2n"], r["r2d"], r["a_id"], r["b_id"], r["c_id"])
        for r in min_enclosing_circle(df, ["g"], id_col="id", res=_RES).collect()
    }
    assert out[0] == (25, 1, 1, 2, None)
    assert out[1] == (0, 1, 4, 8, None)
    assert 2 not in out


def test_validation():
    spark = get_spark()
    df = spark.createDataFrame([(0, 0.5, 0.5, 1)], "g long, x double, y double, id long")
    with pytest.raises(ValueError, match="res"):
        min_enclosing_circle(df, ["g"], id_col="id", res=10)
