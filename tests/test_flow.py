"""D8 density flow: hand-computed pointers/accumulation/basins on tiny
rasters, steepness cross-multiplication cases, tie-break, basin-size
invariant, and an exact numpy brute-force twin on a pseudo-random raster."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.cells import interleave_bits
from metric_search_spark.operators.flow import d8_flow
from tests.sparkutil import get_spark

_RES = 3  # 8x8 raster


def cell_from_cxy(cx: int, cy: int, res: int) -> int:
    return (res << 56) | int(interleave_bits(np.array([cx]), np.array([cy]))[0])


def _pts(cells: dict[tuple[int, int], int]) -> list[tuple[float, float]]:
    """k points at the center of cell (cx, cy) -> occupancy count k."""
    s = 1.0 / (1 << _RES)
    return [
        ((cx + 0.5) * s, (cy + 0.5) * s)
        for (cx, cy), k in cells.items()
        for _ in range(k)
    ]


def _run(cells: dict[tuple[int, int], int]):
    spark = get_spark()
    df = spark.createDataFrame(_pts(cells), "x double, y double")
    rows = d8_flow(df, _RES).collect()
    tid = {c: cell_from_cxy(c[0], c[1], _RES) for c in cells}
    inv = {v: k for k, v in tid.items()}
    out = {
        inv[r["tile"]]: (
            r["elev"],
            inv[r["flow_to"]] if r["flow_to"] is not None else None,
            inv[r["mode"]],
            r["acc"],
        )
        for r in rows
    }
    assert len(out) == len(cells)
    return out


def test_ramp_chain():
    # 1-D ramp 1,2,3,4: a single chain; acc accumulates, mode = the top
    out = _run({(0, 0): 1, (1, 0): 2, (2, 0): 3, (3, 0): 4})
    assert out[(0, 0)] == (1, (1, 0), (3, 0), 1)
    assert out[(1, 0)] == (2, (2, 0), (3, 0), 2)
    assert out[(2, 0)] == (3, (3, 0), (3, 0), 3)
    assert out[(3, 0)] == (4, None, (3, 0), 4)


def test_diagonal_beats_axis_by_cross_multiplication():
    # from (1,1): axis nbr rise 2 (key 2*4=8) vs diagonal rise 3 (key 9)
    out = _run({(1, 1): 1, (2, 1): 3, (2, 2): 4})
    assert out[(1, 1)][1] == (2, 2)
    # axis rise 3 (key 18) beats diagonal rise 4 (key 16)
    out = _run({(1, 1): 1, (2, 1): 4, (2, 2): 5})
    assert out[(1, 1)][1] == (2, 1)


def test_tie_breaks_to_smallest_tile_id():
    # two axis neighbors with identical rise; Morton id of (2,1) vs (1,2):
    # the smaller tile id wins deterministically
    a, b = cell_from_cxy(2, 1, _RES), cell_from_cxy(1, 2, _RES)
    lo = (2, 1) if a < b else (1, 2)
    out = _run({(1, 1): 1, (2, 1): 3, (1, 2): 3})
    assert out[(1, 1)][1] == lo


def test_local_maximum_and_plateau_are_modes():
    # equal-count neighbors: no STRICTLY denser neighbor -> every cell is
    # its own mode with acc 1
    out = _run({(0, 0): 2, (1, 0): 2, (5, 5): 2})
    for c in [(0, 0), (1, 0), (5, 5)]:
        assert out[c] == (2, None, c, 1)


def test_basin_size_equals_mode_accumulation():
    # two separated hills; acc at each mode == #cells labeled with it
    cells = {
        (0, 0): 1, (1, 0): 2, (1, 1): 4,
        (6, 6): 1, (6, 7): 3, (7, 7): 5, (5, 6): 1,
    }
    out = _run(cells)
    modes = {v[2] for v in out.values()}
    for m in modes:
        basin = [c for c, v in out.items() if v[2] == m]
        assert out[m][1] is None
        assert out[m][3] == len(basin)


def _brute(cells: dict[tuple[int, int], int]):
    """Independent numpy twin: argmax by exact integer key, then walk."""
    tid = {c: cell_from_cxy(c[0], c[1], _RES) for c in cells}
    flow: dict[tuple[int, int], tuple[int, int] | None] = {}
    for (cx, cy), e in cells.items():
        best = None
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                n = (cx + dx, cy + dy)
                if n not in cells or cells[n] <= e:
                    continue
                rise = cells[n] - e
                key = rise * rise * (2 if dx * dx + dy * dy == 1 else 1)
                kt = (key, -tid[n])
                if best is None or kt > best[0]:
                    best = (kt, n)
        flow[(cx, cy)] = best[1] if best else None
    acc = {c: 1 for c in cells}
    for c in sorted(cells, key=lambda c: cells[c]):  # ascending elevation
        if flow[c] is not None:
            acc[flow[c]] += acc[c]
    mode = {}
    for c in cells:
        cur = c
        while flow[cur] is not None:
            cur = flow[cur]
        mode[c] = cur
    return {c: (cells[c], flow[c], mode[c], acc[c]) for c in cells}


def test_brute_force_parity_pseudorandom_raster():
    # deterministic MINSTD-ish raster over a 8x8 grid, ~60% occupancy
    cells = {}
    state = 1
    for cx in range(8):
        for cy in range(8):
            state = (state * 48271) % 2147483647
            if state % 10 < 6:
                cells[(cx, cy)] = 1 + state % 17
    out = _run(cells)
    want = _brute(cells)
    assert out == want


def test_validation():
    spark = get_spark()
    df = spark.createDataFrame([(0.5, 0.5)], "x double, y double")
    with pytest.raises(ValueError, match="resolution"):
        d8_flow(df, 0)
