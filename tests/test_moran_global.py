"""Global Moran's I: sign behavior on crafted lattices (clustered
positive, alternating negative), brute-force recompute parity, and
exact-integer output invariants."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.operators.tiling import moran_global, tile_assign

from tests.sparkutil import get_spark

RES = 3  # 8x8 lattice
S = 2.0**-RES


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _pts_df(spark, cells):
    """cells: list of (cx, cy, count) — place `count` points at the cell
    center."""
    rows = []
    i = 0
    for cx, cy, cnt in cells:
        for _ in range(cnt):
            rows.append((i, (cx + 0.5) * S, (cy + 0.5) * S))
            i += 1
    return spark.createDataFrame(rows, "id long, x double, y double")


def _brute(cells):
    zs = {(cx, cy): cnt for cx, cy, cnt in cells}
    n = len(zs)
    s = sum(zs.values())
    cross = w = 0
    for (ax, ay), zi in zs.items():
        for (bx, by), zj in zs.items():
            if (ax, ay) != (bx, by) and abs(ax - bx) <= 1 and abs(ay - by) <= 1:
                w += 1
                cross += (n * zi - s) * (n * zj - s)
    dev2 = sum((n * z - s) ** 2 for z in zs.values())
    return n, w, (n * cross) / (w * dev2)


def _run(spark, cells):
    r = moran_global(_pts_df(spark, cells), RES).collect()[0]
    return r["n_tiles"], r["w_pairs"], r["moran_i"]


def test_clustered_positive_alternating_negative(spark):
    # a 2x2 block of heavy cells next to a 2x2 block of light cells:
    # like-neighbors-like -> positive autocorrelation
    clustered = [(0, 0, 9), (0, 1, 9), (1, 0, 9), (1, 1, 9),
                 (3, 0, 1), (3, 1, 1), (4, 0, 1), (4, 1, 1)]
    n, w, i = _run(spark, clustered)
    assert i > 0
    # alternating heavy/light along a line: every queen neighbor is the
    # opposite weight -> negative autocorrelation
    alternating = [(x, 0, 9 if x % 2 == 0 else 1) for x in range(8)]
    n2, w2, i2 = _run(spark, alternating)
    assert i2 < 0


def test_brute_parity(spark):
    rng = np.random.default_rng(4)
    occupied = [(int(cx), int(cy)) for cx, cy in
                {tuple(p) for p in rng.integers(0, 8, (20, 2))}]
    cells = [(cx, cy, int(rng.integers(1, 7))) for cx, cy in occupied]
    n, w, i = _run(spark, cells)
    bn, bw, bi = _brute(cells)
    assert (n, w) == (bn, bw)
    assert i == pytest.approx(bi, abs=1e-9)


def test_uniform_counts_still_defined(spark):
    # equal z everywhere makes dev2 = 0: the index is undefined -> NULL
    # (pinned in both engines; ANSI would otherwise raise DIVIDE_BY_ZERO)
    cells = [(x, y, 3) for x in range(2) for y in range(2)]
    r = moran_global(_pts_df(spark, cells), RES).collect()[0]
    assert r["n_tiles"] == 4 and r["w_pairs"] == 12
    assert r["moran_i"] is None
